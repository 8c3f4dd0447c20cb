import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    import ray.data

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    # mixed null/non-null list<int32> columns (patched token payloads)
    # trip Ray's pandas TensorArray auto-cast; keep plain object lists
    ray.data.DataContext.get_current().enable_tensor_extension_casting = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_seq_files():
    from swarm_ray import fixtures
    return fixtures.sequences_files("sf0.001")

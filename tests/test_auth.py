"""Auth policy plane (rules/auth.py) — M7, ≙ data.auth evaluation:
default-allow, deny-on-match (pkg/usecase/auth.go:16-43), multi-valued
query/header fields iterate like Rego sets."""

import json

import pytest

from swarm_ray.rules.auth import (AuthPolicyInput, AuthRule, Unauthorized,
                                  authorize, load_auth_rules)
from swarm_ray.rules.spec import Cond


def test_default_allow_no_rules():
    authorize(AuthPolicyInput(method="ingest", path="/out"), [])  # no raise


def test_deny_on_path_prefix():
    rules = [AuthRule("no-prod-writes",
                      (Cond("path", "prefix", "/prod"),))]
    authorize(AuthPolicyInput(method="ingest", path="/dev/out"), rules)
    with pytest.raises(Unauthorized, match="no-prod-writes"):
        authorize(AuthPolicyInput(method="ingest", path="/prod/out"), rules)


def test_conjunction_and_multivalue_header():
    # deny DELETEs lacking an admin token — conds are a conjunction;
    # header values are lists (≙ http.Header), ANY value matches
    rules = [AuthRule("method-block", (
        Cond("method", "eq", "migrate"),
        Cond("header.role", "ne", "admin"),
    ))]
    ok = AuthPolicyInput(method="migrate", header={"role": ["admin"]})
    authorize(ok, rules)                      # admin passes
    with pytest.raises(Unauthorized):
        authorize(AuthPolicyInput(method="migrate",
                                  header={"role": ["dev", "ops"]}), rules)
    # absent field: no candidate value -> cond can't match -> allow
    authorize(AuthPolicyInput(method="ingest", header={}), rules)


def test_absent_field_never_matches():
    rules = [AuthRule("needs-field", (Cond("query.token", "eq", "x"),))]
    authorize(AuthPolicyInput(method="ingest"), rules)   # token absent
    with pytest.raises(Unauthorized):
        authorize(AuthPolicyInput(method="ingest", query={"token": "x"}), rules)


def test_regex_and_remote():
    rules = [AuthRule("block-bots", (Cond("remote", "regex", r"^bot-"),))]
    with pytest.raises(Unauthorized):
        authorize(AuthPolicyInput(remote="bot-7"), rules)
    authorize(AuthPolicyInput(remote="alice"), rules)


def test_allow_rule_does_not_contribute():
    rules = [AuthRule("doc-allow", (Cond("method", "eq", "ingest"),), deny=False),
             AuthRule("deny-schema", (Cond("method", "eq", "schema"),))]
    authorize(AuthPolicyInput(method="ingest"), rules)
    with pytest.raises(Unauthorized):
        authorize(AuthPolicyInput(method="schema"), rules)


def test_cli_auth_gate(ray_session, tmp_path, capsys):
    from swarm_ray import fixtures
    from swarm_ray.cli import main

    rules_file = tmp_path / "auth.json"
    rules_file.write_text(json.dumps({"auth_rules": [
        {"name": "freeze-prod",
         "where": [{"field": "path", "op": "contains", "value": "frozen"}]},
    ]}))
    pattern = str(fixtures.sequences_dir("sf0.001") / "*.parquet")

    rc = main(["--auth-rules", str(rules_file), "ingest",
               "--input", pattern, "--out", str(tmp_path / "frozen_out")])
    assert rc == 77
    assert "freeze-prod" in capsys.readouterr().out
    assert not (tmp_path / "frozen_out").exists()

    rc = main(["--auth-rules", str(rules_file), "ingest",
               "--input", pattern, "--out", str(tmp_path / "ok_out")])
    assert rc == 0

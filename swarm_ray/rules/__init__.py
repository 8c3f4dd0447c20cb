from .spec import Cond, Action, Rule, Ruleset, default_ruleset
from .compile import CompiledRuleset

__all__ = ["Cond", "Action", "Rule", "Ruleset", "default_ruleset", "CompiledRuleset"]

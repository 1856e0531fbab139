"""Physical-plan inspection utilities (the .explain feedback loop).

The engine ships no custom Catalyst rules — by design (SURVEY.md §4.3:
the state-store SPI sits below Catalyst, and every batch operator is
declarative so Catalyst's own pushdown/pruning/join-selection/AQE apply).
What this package provides instead is the *verification* side: helpers to
read a DataFrame's formatted physical plan so tests (tests/test_plans.py)
can pin the scale-critical plan shapes — pushed filters, pruned schemas,
broadcast joins, map-side partial aggregation.
"""

from .inspect import plan_str, scan_section

__all__ = ["plan_str", "scan_section"]

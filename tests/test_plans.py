"""Physical-plan shape assertions — the 100 TB scale gate.

Correctness says the operators compute the right answer; these tests pin
down that they compute it with the right PLAN: predicates and projection
pushed into the parquet scan, small dimensions broadcast (the fact side
never shuffles for them), partial (map-side) aggregation before every
aggregate shuffle, and no accidental cartesian/nested-loop joins anywhere
in the catalog. A regression here is invisible at sf0.01 and fatal at
1000 executors.
"""

import pytest

from spark_states_spark.catalog import QUERIES
from spark_states_spark.plans import plan_str as plan


def test_q6_filters_and_projection_reach_scan(spark, sf_dir):
    """Q6 is the canonical pushdown probe: all four predicates should show
    in PushedFilters and the scan should read only the 4 needed columns."""
    p = plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    scan = p[p.index("Scan parquet") :]
    pushed = scan[scan.index("PushedFilters") : scan.index("ReadSchema")]
    for frag in ["l_shipdate", "l_discount", "l_quantity"]:
        assert frag in pushed, f"{frag} not pushed: {pushed}"
    read = scan[scan.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" in read
    assert "l_returnflag" not in read, f"unpruned column: {read}"


def test_filter_project_prunes_columns(spark, sf_dir):
    p = plan(QUERIES["filter_project"](spark, sf_dir))
    scan = p[p.index("Scan parquet") :]
    read = scan[scan.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" not in read or "l_quantity" in read


@pytest.mark.parametrize(
    "name",
    [
        "join_broadcast_dim",
        "q5_region_revenue",
        "q7_nation_volume",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_revenue",
        "q14_promo_revenue",
    ],
)
def test_dim_joins_are_broadcast(spark, sf_dir, name):
    """Fact⋈dim joins must be BroadcastHashJoin — a sort-merge join here
    means the 100 TB fact table shuffles on the join key for nothing."""
    p = plan(QUERIES[name](spark, sf_dir))
    assert "BroadcastHashJoin" in p, f"no broadcast join in {name}:\n{p}"


@pytest.mark.parametrize("name", ["q1_pricing_summary", "distinct_counts", "q18_large_volume"])
def test_aggregates_have_mapside_partial(spark, sf_dir, name):
    """Two HashAggregate nodes (partial + final) around the exchange —
    map-side combine is what keeps agg shuffles proportional to groups,
    not rows."""
    p = plan(QUERIES[name](spark, sf_dir))
    assert p.count("HashAggregate") >= 2, f"no partial agg in {name}:\n{p}"
    assert "Exchange" in p


def test_q18_aggregates_before_join(spark, sf_dir):
    """The HAVING collapse must run before the orders join: HashAggregate
    appears below (after, in formatted order) the join inputs, i.e. the
    join probe side is the aggregated keyset, not raw lineitem."""
    p = plan(QUERIES["q18_large_volume"](spark, sf_dir))
    # formatted explain lists the tree root-first; the aggregate feeding the
    # join must exist, and no join may consume an unaggregated lineitem scan
    # (lineitem appears exactly once, under the aggregate).
    assert p.count("lineitem.parquet") == 1
    assert "HashAggregate" in p


# Queries where a nested-loop/cartesian join is the *intended* shape:
# brute-force similarity broadcasts 8 query vectors against the corpus scan
# (a BroadcastNestedLoopJoin over a non-equi predicate), the scalar
# subquery is a broadcast of a 1-row aggregate, and IVF assignment is a
# deliberate broadcast cross-join against the 16-row centroid table.
_NON_EQUI_BY_DESIGN = {
    "similarity_cosine_topk",
    "scalar_subquery_avg",
    "similarity_ivf_ann",
    "q22_idle_customers",  # 1-row avg-balance threshold broadcast
    "q15_top_supplier",  # 1-row max-revenue threshold broadcast
}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - _NON_EQUI_BY_DESIGN))
def test_no_accidental_cartesian(spark, sf_dir, name):
    p = plan(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in p, f"cartesian product in {name}"
    assert "BroadcastNestedLoopJoin" not in p, f"nested-loop join in {name}"

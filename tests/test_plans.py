"""Physical-plan hygiene: pushdown, pruning, broadcast — the properties
that decide whether these queries survive a 100x scale-up."""

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, fn):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(spark, SF).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, E.q_scan_agg)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    # column pruning: the scan must not read l_comment-like unused cols
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_partkey" not in read_schema  # unused by q_scan_agg


def test_broadcast_join_chosen(spark):
    plan = _plan(spark, E.q_broadcast_join)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_and_anti_joins(spark):
    plan_semi = _plan(spark, E.q_semi_join)
    assert "LeftSemi" in plan_semi
    plan_anti = _plan(spark, E.q_seen_antijoin)
    assert "LeftAnti" in plan_anti


def test_topk_single_window_shuffle(spark):
    plan = _plan(spark, E.q_topk_per_group)
    # exactly one exchange (hash by nation) feeding the window sort
    assert plan.count("Exchange") <= 2  # AQE may add a read stage marker
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_whole_stage_codegen_on_aggregates(spark):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        E.q_scan_agg(spark, SF).explain("codegen")
    plan = buf.getvalue()
    assert "WholeStageCodegen" in plan
    assert "Found" in plan  # "Found N WholeStageCodegen subtrees"

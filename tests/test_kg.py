"""KG query operators (gtfs2lc_spark/kg.py): star join, predicate
stats, and Connection-Scan earliest arrival.

The reference materializes the graph (lib/Connections2Triples.js) and
leaves querying to its Linked Connections consumers; these operators
are the Spark-side closure of that loop, so the tests pin them against
first-principles recomputations rather than reference fixtures.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gtfs2lc_spark import kg, sinks

LC = "http://semweb.mmlab.be/ns/linkedconnections#"
GT = "http://vocab.gtfs.org/terms#"


@pytest.fixture(scope="module")
def triples(connections):
    return sinks.connections_to_triples(connections).select(
        "subj", "pred", "obj"
    ).cache()


def test_star_join_roundtrips_connection_fields(connections, triples):
    """Reassembling (dep stop, times) from triples must reproduce the
    connection rows the triples were exploded from."""
    star = kg.star_join(
        triples,
        {
            "departureStop": f"{LC}departureStop",
            "departureTime": f"{LC}departureTime",
            "arrivalTime": f"{LC}arrivalTime",
        },
    )
    jl = sinks.connections_to_jsonld(connections).select(
        F.col("id").alias("subj"), "departureStop", "departureTime", "arrivalTime"
    )
    assert star.count() == jl.count()
    assert (
        star.join(jl, "subj")
        .where(
            (star["departureStop"] != jl["departureStop"])
            | (star["departureTime"] != jl["departureTime"])
            | (star["arrivalTime"] != jl["arrivalTime"])
        )
        .count()
        == 0
    )


def test_star_join_missing_predicate_is_null(triples):
    """OPTIONAL semantics: absent predicate -> NULL, not a dropped row."""
    star = kg.star_join(
        triples, {"nope": f"{GT}doesNotExist", "type": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"}
    )
    assert star.where(F.col("nope").isNotNull()).count() == 0
    assert star.where(F.col("type").isNull()).count() == 0


def test_star_join_single_shuffle(spark):
    """The star join must plan as ONE hash aggregate (partial+final)
    over one Exchange — no joins at all.  Asserted over a plain
    source so upstream pipeline exchanges don't muddy the count."""
    t = spark.createDataFrame(
        [("s1", f"{GT}trip", "t1"), ("s1", f"{GT}route", "r1")],
        "subj string, pred string, obj string",
    )
    plan = (
        kg.star_join(t, {"t": f"{GT}trip", "r": f"{GT}route"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_predicate_stats_counts(triples):
    stats = {r["pred"]: r for r in kg.predicate_stats(triples).collect()}
    n_conn = triples.where(
        F.col("pred") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    ).count()
    dep = stats[f"{LC}departureStop"]
    assert dep["n_triples"] == n_conn
    assert dep["n_distinct_subj"] == n_conn
    # fixture has a bounded stop vocabulary
    assert 0 < dep["n_distinct_obj"] < 50


def test_triple_diff_semantics(spark):
    t = lambda rows: spark.createDataFrame(rows, "subj string, pred string, obj string")
    old = t([("s1", "p", "a"), ("s2", "p", "b")])
    new = t([("s1", "p", "a"), ("s2", "p", "B"), ("s3", "p", "c")])
    got = {
        (r["subj"], r["obj"], r["change"]) for r in kg.triple_diff(old, new).collect()
    }
    assert got == {
        ("s2", "B", "added"),
        ("s3", "c", "added"),
        ("s2", "b", "removed"),
    }
    assert kg.triple_diff(old, old).count() == 0


def _ea_df(spark, rows):
    return spark.createDataFrame(
        [
            (d, a, dt.datetime.fromisoformat(t1), dt.datetime.fromisoformat(t2))
            for d, a, t1, t2 in rows
        ],
        "dep_stop_id string, arr_stop_id string, "
        "departure_ts timestamp, arrival_ts timestamp",
    )


def test_earliest_arrival_respects_time(spark):
    """A connection departing before the frontier label is NOT
    catchable; a later one is.  Chain A->B->C where the B->C leg at
    09:00 departs before arrival at B (09:30) — only the 10:00 leg
    works."""
    conns = _ea_df(
        spark,
        [
            ("A", "B", "2026-01-01T09:00:00", "2026-01-01T09:30:00"),
            ("B", "C", "2026-01-01T09:00:00", "2026-01-01T09:10:00"),  # uncatchable
            ("B", "C", "2026-01-01T10:00:00", "2026-01-01T10:40:00"),
            ("X", "Y", "2026-01-01T11:00:00", "2026-01-01T11:30:00"),  # disconnected
        ],
    )
    got = {
        r["stop"]: r["earliest"]
        for r in kg.earliest_arrivals(conns, "A", "2026-01-01 08:00:00").collect()
    }
    assert set(got) == {"A", "B", "C"}
    assert got["B"] == dt.datetime(2026, 1, 1, 9, 30)
    assert got["C"] == dt.datetime(2026, 1, 1, 10, 40)


def test_earliest_arrival_min_label_dominates(spark):
    """Two routes to B: slower direct, faster via C.  The faster
    arrival must win even though it appears in a later relaxation
    round (label correction, not label setting)."""
    conns = _ea_df(
        spark,
        [
            ("A", "B", "2026-01-01T08:00:00", "2026-01-01T12:00:00"),
            ("A", "C", "2026-01-01T08:00:00", "2026-01-01T08:30:00"),
            ("C", "B", "2026-01-01T09:00:00", "2026-01-01T09:30:00"),
        ],
    )
    got = {
        r["stop"]: r["earliest"]
        for r in kg.earliest_arrivals(conns, "A", "2026-01-01 07:00:00").collect()
    }
    assert got["B"] == dt.datetime(2026, 1, 1, 9, 30)


def test_earliest_arrival_nonconvergence_raises(spark):
    """Exhausting max_rounds while labels still improve must raise —
    same strict contract as connected_components."""
    conns = _ea_df(
        spark,
        [
            ("A", "B", "2026-01-01T08:00:00", "2026-01-01T08:10:00"),
            ("B", "C", "2026-01-01T08:20:00", "2026-01-01T08:30:00"),
            ("C", "D", "2026-01-01T08:40:00", "2026-01-01T08:50:00"),
        ],
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kg.earliest_arrivals(conns, "A", "2026-01-01 07:00:00", max_rounds=1)


def test_earliest_arrival_broadcasts_frontier(spark):
    """The relaxation join must broadcast the label frontier — the
    connection fact side never shuffles."""
    conns = _ea_df(
        spark, [("A", "B", "2026-01-01T08:00:00", "2026-01-01T08:10:00")]
    )
    labels = kg.earliest_arrivals(conns, "A", "2026-01-01 07:00:00")
    # the loop has finished; assert the shape on a rebuilt single round
    from gtfs2lc_spark.materialize import materialize

    cset = conns.select(
        F.col("dep_stop_id").alias("_dep"),
        F.col("arr_stop_id").alias("_arr"),
        F.col("departure_ts").alias("_dep_ts"),
        F.col("arrival_ts").alias("_arr_ts"),
    )
    relax = cset.join(
        F.broadcast(labels),
        (cset["_dep"] == labels["stop"]) & (cset["_dep_ts"] >= labels["earliest"]),
    )
    plan = relax._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_link_entities_tiers_and_canonicalization(spark):
    """Tier precedence (id beats name), normalization (case/punct),
    min-id canonical pick for ambiguous names, and 'none' survival."""
    dictionary = spark.createDataFrame(
        [("S1", "Alpha Station"), ("S2", "Beta Halt"), ("S0", "Alpha Station")],
        "stop_id string, stop_name string",
    )
    mentions = spark.createDataFrame(
        [
            (1, "S2"),
            (2, "ALPHA   station!!"),
            (3, "beta halt"),
            (4, "Gamma Stop"),
        ],
        "mention_id int, raw string",
    )
    got = {
        r.mention_id: (r.linked_id, r.link_method)
        for r in kg.link_entities(mentions, dictionary).collect()
    }
    assert got[1] == ("S2", "id")
    assert got[2] == ("S0", "name")  # min stop_id wins the ambiguous name
    assert got[3] == ("S2", "name")
    assert got[4] == (None, "none")


def test_link_entities_plan_is_broadcast_only(spark):
    """Both dictionary probes must be broadcast hash joins — the
    mention fact table never shuffles for linking."""
    dictionary = spark.createDataFrame(
        [("S1", "Alpha Station")], "stop_id string, stop_name string"
    )
    mentions = spark.range(100).select(
        F.col("id").alias("mention_id"),
        F.concat(F.lit("m"), F.col("id")).alias("raw"),
    )
    plan = (
        kg.link_entities(mentions, dictionary)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_geo_cluster_pairs_radius_and_cell_boundary(spark):
    """Exact haversine radius (44 m in, 122/167 m out) and lossless
    blocking across a grid-cell boundary (0.2 m apart, cells differ)."""
    pts = spark.createDataFrame(
        [
            (1, 36.0000, 0.0),
            (2, 36.0004, 0.0),   # ~44.5 m from 1 -> pair
            (3, 36.0015, 0.0),   # ~167 m from 1, ~122 m from 2 -> alone
            (4, 36.001999, 0.5),  # straddles the 36.002 cell edge with 5
            (5, 36.002001, 0.5),
        ],
        "id int, lat double, lon double",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in kg.geo_cluster_pairs(pts, radius_m=100.0).collect()
    }
    assert pairs == {(1, 2), (4, 5)}


def test_geo_cluster_pairs_plan_is_equijoin(spark):
    """Blocking must compile to an equi-join on the cell key — never a
    cartesian / nested-loop all-pairs plan."""
    pts = spark.range(1000).select(
        F.col("id"),
        (F.lit(36.0) + (F.col("id") % 100) * F.lit(0.01)).alias("lat"),
        (F.lit(-116.0) + (F.col("id") % 100) * F.lit(0.01)).alias("lon"),
    )
    plan = (
        kg.geo_cluster_pairs(pts)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_one_iteration_closed_form(spark):
    """A->B, B->A, C->A (all outdeg 1): after one iteration
    r(A) = t + d*(r0(B) + r0(C)), r(B) = t + d*r0(A), r(C) = t,
    with t = (1-d)/3 and r0 = 1/3; mass is conserved (no dangling)."""
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("C", "A")], "src string, dst string"
    )
    got = {r.node: r.rank for r in kg.pagerank(edges, iterations=1).collect()}
    t, d, r0 = (1.0 - 0.85) / 3, 0.85, 1.0 / 3
    assert got["A"] == pytest.approx(t + d * (r0 + r0), rel=1e-12)
    assert got["B"] == pytest.approx(t + d * r0, rel=1e-12)
    assert got["C"] == pytest.approx(t, rel=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_sink_and_multi_edge(spark):
    """Dangling node leaks its mass (no out-edges contribute);
    duplicate edges weight contributions proportionally."""
    edges = spark.createDataFrame(
        [("A", "B"), ("A", "B"), ("A", "C")], "src string, dst string"
    )
    got = {r.node: r.rank for r in kg.pagerank(edges, iterations=1).collect()}
    t, d, r0 = (1.0 - 0.85) / 3, 0.85, 1.0 / 3
    # A's outdeg is 3 (multi-edge counted); B gets 2/3 of A's rank
    assert got["B"] == pytest.approx(t + d * (2 * r0 / 3), rel=1e-12)
    assert got["C"] == pytest.approx(t + d * (r0 / 3), rel=1e-12)
    assert got["A"] == pytest.approx(t, rel=1e-12)


def _bgp_triples(spark):
    rows = [
        ("a", "type", "Person"), ("a", "knows", "b"), ("a", "worksAt", "x"),
        ("b", "type", "Person"), ("b", "knows", "c"), ("b", "worksAt", "x"),
        ("c", "type", "Person"), ("c", "worksAt", "y"),
        ("x", "type", "Org"), ("y", "type", "Org"),
        ("a", "likes", "a"),  # reflexive: for the repeated-var pattern
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_bgp_match_colleague_pattern(spark):
    """?p and ?q both Persons at the same ?org — classic 4-pattern BGP.
    Includes the p == q diagonal (BGP semantics keep it)."""
    t = _bgp_triples(spark)
    got = kg.bgp_match(
        t,
        [
            ("?p", "type", "Person"),
            ("?p", "worksAt", "?org"),
            ("?q", "type", "Person"),
            ("?q", "worksAt", "?org"),
        ],
    )
    assert got.columns == ["p", "org", "q"]
    pairs = {(r.p, r.org, r.q) for r in got.collect()}
    assert pairs == {
        ("a", "x", "a"), ("a", "x", "b"), ("b", "x", "a"),
        ("b", "x", "b"), ("c", "y", "c"),
    }


def test_bgp_match_repeated_var_and_constants(spark):
    t = _bgp_triples(spark)
    # repeated variable inside one pattern: subj == obj
    got = kg.bgp_match(t, [("?s", "likes", "?s")]).collect()
    assert [(r.s,) for r in got] == [("a",)]
    # all-constant pattern is rejected (ASK, not SELECT)
    with pytest.raises(ValueError, match="no variables"):
        kg.bgp_match(t, [("a", "type", "Person")])
    # disconnected groups raise instead of going cartesian
    with pytest.raises(ValueError, match="disconnected"):
        kg.bgp_match(t, [("?p", "type", "Person"), ("?o", "type", "Org")])
    prod = kg.bgp_match(
        t,
        [("?p", "type", "Person"), ("?o", "type", "Org")],
        allow_product=True,
    )
    assert prod.count() == 6  # 3 persons x 2 orgs


def test_bgp_match_join_order_invariance(spark):
    """The selectivity-ordered planner must not change the solution
    set: every permutation of the pattern list gives the same rows."""
    import itertools

    t = _bgp_triples(spark)
    pats = [
        ("?p", "knows", "?q"),
        ("?p", "worksAt", "?org"),
        ("?q", "type", "Person"),
    ]
    expect = None
    for perm in itertools.permutations(pats):
        rows = {
            tuple(sorted(r.asDict().items()))
            for r in kg.bgp_match(t, list(perm)).collect()
        }
        if expect is None:
            expect = rows
        assert rows == expect
    assert expect == {
        (("org", "x"), ("p", "a"), ("q", "b")),
        (("org", "x"), ("p", "b"), ("q", "c")),
    }


def test_triangles_exact_enumeration(spark):
    """K4 minus one edge has exactly 2 triangles; extra direction
    duplicates, self-loops, and multi-edges must not change the set."""
    edges = [
        (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (3, 4),  # K4 minus (2,4)
        (5, 5),  # self-loop ignored
        (1, 2),  # multi-edge deduped
        (4, 6),  # dangling edge, no triangle
    ]
    got = kg.triangles(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()
    assert {(r.n1, r.n2, r.n3) for r in got} == {(1, 2, 3), (1, 3, 4)}
    assert len(got) == 2  # each triangle exactly once


def test_triangles_degree_orientation_matches_bruteforce(spark):
    """Seeded random 20-node graph (30 triangles): degree-ordered
    enumeration equals the brute-force id-ordered closure computed
    driver-side."""
    import random

    rnd = random.Random(42)
    edges = [(rnd.randrange(20), rnd.randrange(20)) for _ in range(60)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {(r.n1, r.n2, r.n3) for r in kg.triangles(df).collect()}
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    brute = {
        (a, b, c)
        for (a, b) in und
        for c in range(20)
        if b < c and (b, c) in und and (a, c) in und
    }
    assert got == brute and len(brute) > 0


# ---------------------------------------------------------------------------
# transitive_closure / rdfs_infer
# ---------------------------------------------------------------------------

def test_transitive_closure_chain_and_branch(spark):
    """Doubling closure over a small DAG = hand-enumerated pair set."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 2)], "src int, dst int"
    )
    got = {(r.src, r.dst) for r in kg.transitive_closure(edges).collect()}
    assert got == {
        (1, 2), (2, 3), (3, 4), (5, 2),
        (1, 3), (2, 4), (5, 3),
        (1, 4), (5, 4),
    }


def test_transitive_closure_cycle_terminates_and_is_reflexive_on_cycle(spark):
    """A 3-cycle converges (set semantics) and every cycle node reaches
    itself — matching WITH RECURSIVE ... UNION."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    got = {(r.src, r.dst) for r in kg.transitive_closure(edges).collect()}
    assert got == {(a, b) for a in (1, 2, 3) for b in (1, 2, 3)}


def test_transitive_closure_nonconvergence_raises(spark):
    """max_rounds=1 on a 3-edge chain (needs length-3 paths => 2 rounds)
    must raise, not return a truncated closure."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    with pytest.raises(RuntimeError, match="did not converge"):
        kg.transitive_closure(edges, max_rounds=1)


RDFS_SC = kg.RDFS_SUBCLASSOF
RDFS_SP = kg.RDFS_SUBPROPERTYOF
RDF_T = kg.RDF_TYPE


def test_rdfs_infer_exact_entailment(spark):
    """rdfs5/7/9/11 on a 2-level class chain + 2-level property chain:
    the inferred set is exactly the textbook entailment, asserted rows
    keep inferred=false."""
    data = spark.createDataFrame(
        [("a", RDF_T, "C1"), ("a", "p1", "b")],
        "subj string, pred string, obj string",
    )
    onto = spark.createDataFrame(
        [
            ("C1", RDFS_SC, "C2"), ("C2", RDFS_SC, "C3"),
            ("p1", RDFS_SP, "p2"), ("p2", RDFS_SP, "p3"),
        ],
        "subj string, pred string, obj string",
    )
    out = kg.rdfs_infer(data, onto)
    inferred = {
        (r.subj, r.pred, r.obj) for r in out.where(F.col("inferred")).collect()
    }
    assert inferred == {
        ("a", RDF_T, "C2"), ("a", RDF_T, "C3"),        # rdfs9 via closure
        ("a", "p2", "b"), ("a", "p3", "b"),            # rdfs7 via closure
        ("C1", RDFS_SC, "C3"),                          # rdfs11
        ("p1", RDFS_SP, "p3"),                          # rdfs5
    }
    asserted = {
        (r.subj, r.pred, r.obj)
        for r in out.where(~F.col("inferred")).collect()
    }
    assert asserted == {
        ("a", RDF_T, "C1"), ("a", "p1", "b"),
        ("C1", RDFS_SC, "C2"), ("C2", RDFS_SC, "C3"),
        ("p1", RDFS_SP, "p2"), ("p2", RDFS_SP, "p3"),
    }


def test_rdfs_infer_subproperty_feeds_type_inference(spark):
    """A type triple minted by rdfs7 (pred subPropertyOf rdf:type)
    participates in rdfs9 — the stratification order is property
    inference first."""
    data = spark.createDataFrame(
        [("a", "isA", "C1")], "subj string, pred string, obj string"
    )
    onto = spark.createDataFrame(
        [("isA", RDFS_SP, RDF_T), ("C1", RDFS_SC, "C2")],
        "subj string, pred string, obj string",
    )
    out = kg.rdfs_infer(data, onto)
    inferred = {
        (r.subj, r.pred, r.obj) for r in out.where(F.col("inferred")).collect()
    }
    assert (("a", RDF_T, "C1")) in inferred
    assert (("a", RDF_T, "C2")) in inferred


def test_canonicalize_triples_rewrites_and_collapses(spark):
    """subj AND obj rewrite through the map; unmapped ids pass through;
    facts that become identical after the merge collapse to one row."""
    tr = spark.createDataFrame(
        [("a1", "p", "b"), ("a2", "p", "b"), ("c", "p", "a2"), ("x", "p", "y")],
        "subj string, pred string, obj string",
    )
    cmap = spark.createDataFrame(
        [("a1", "A"), ("a2", "A")], "id string, canonical_id string"
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in kg.canonicalize_triples(tr, cmap).collect()
    }
    assert got == {
        ("A", "p", "b"),     # a1/a2 rows merged into one
        ("c", "p", "A"),     # object rewritten
        ("x", "p", "y"),     # untouched
    }


def test_canonicalize_triples_broadcast_plan(spark):
    """Default plan: two BroadcastHashJoins, no SortMergeJoin — the
    fact table never shuffles for the rewrite."""
    tr = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    cmap = spark.createDataFrame([("a", "A")], "id string, canonical_id string")
    plan = (
        kg.canonicalize_triples(tr, cmap)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_rdfs_infer_single_wide_op(spark):
    """Dedup + inferred flag come from ONE hash aggregation over the
    tagged candidate union — no anti-join, no extra distincts (the
    closure rounds aside, which run on schema-sized data)."""
    data = spark.createDataFrame(
        [("a", RDF_T, "C1")], "subj string, pred string, obj string"
    )
    onto = spark.createDataFrame(
        [("C1", RDFS_SC, "C2")], "subj string, pred string, obj string"
    )
    plan = (
        kg.rdfs_infer(data, onto)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "LeftAnti" not in plan and "left_anti" not in plan


def test_validate_shapes_min_max_and_conforming_silence(spark):
    """missing (n < min), excess (n > max), unbounded max, and a fully
    conforming focus node that emits nothing; non-focus subjects are
    never checked."""
    T = RDF_T
    tr = spark.createDataFrame(
        [
            ("c1", T, "Conn"), ("c1", "dep", "a"),                      # missing arr
            ("c2", T, "Conn"), ("c2", "dep", "a"), ("c2", "arr", "b"),
            ("c2", "tag", "x"), ("c2", "tag", "y"), ("c2", "tag", "z"),  # tags unbounded
            ("c3", T, "Conn"), ("c3", "dep", "a"), ("c3", "dep", "a2"),
            ("c3", "arr", "b"),                                          # excess dep
            ("other", "dep", "q"),                                       # not a focus
        ],
        "subj string, pred string, obj string",
    )
    out = kg.validate_shapes(
        tr,
        {"Conn": {"dep": {"min": 1, "max": 1}, "arr": {"min": 1, "max": 1},
                  "tag": {"min": 0}}},
    )
    got = {(r.focus, r.pred): (r.n, r.violation) for r in out.collect()}
    assert got == {
        ("c1", "arr"): (0, "missing"),
        ("c3", "dep"): (2, "excess"),
    }


def test_state_at_replay_semantics(spark):
    """CDC replay: last-change-wins per triple at the as-of bound;
    same-instant add+del resolves del (conservative); changes after
    the bound are invisible; re-add after del resurrects."""
    from gtfs2lc_spark import kg

    rows = [
        # s1: add @1, del @5, add @7  -> present at 10, absent at 6
        ("s1", "p", "o", "add", 1),
        ("s1", "p", "o", "del", 5),
        ("s1", "p", "o", "add", 7),
        # s2: add and del at the SAME instant -> del wins
        ("s2", "p", "o", "add", 3),
        ("s2", "p", "o", "del", 3),
        # s3: added only after the bound
        ("s3", "p", "o", "add", 11),
        # s4: plain add
        ("s4", "p", "o", "add", 2),
    ]
    ch = spark.createDataFrame(rows, ["subj", "pred", "obj", "op", "t"])

    def state(as_of):
        return {r["subj"] for r in kg.state_at(ch, as_of).collect()}

    assert state(10) == {"s1", "s4"}
    assert state(6) == {"s4"}
    assert state(3) == {"s1", "s4"}   # s2's same-instant del wins; s1 not yet deleted
    assert state(12) == {"s1", "s3", "s4"}


def test_degree_histogram_loops_and_multi_edges(spark):
    """Self-loops excluded; multi-edges and reverse duplicates count a
    neighbor once (distinct undirected neighbor set)."""
    from gtfs2lc_spark import kg

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (4, 5)],
        ["src", "dst"],
    )
    got = {r["degree"]: r["n_nodes"] for r in kg.degree_histogram(edges).collect()}
    # degrees: 1->{2}=1? no: 1-{2}, 2-{1,3}, 3-{2}, 4-{5}, 5-{4}
    assert got == {1: 4, 2: 1}


def test_crawl_priorities_ordering(spark):
    """Equal-authority hosts: the one with fewer held docs gets the
    higher crawl priority; absent hosts count zero docs."""
    from gtfs2lc_spark import kg

    # symmetric 2-cycle: equal ranks for 0 and 1
    edges = spark.createDataFrame([(0, 1), (1, 0)], ["src", "dst"])
    held = spark.createDataFrame([(0, 9)], ["node", "n_docs"])
    got = {r["host"]: r for r in kg.crawl_priorities(edges, held).collect()}
    assert got[0]["rank"] == got[1]["rank"]
    assert got[1]["n_docs"] == 0
    assert got[1]["crawl_priority"] > got[0]["crawl_priority"]
    assert got[0]["crawl_priority"] == round(got[0]["rank"] / 10, 6)


def test_fuzzy_link_typo_tiers_and_blocking(spark):
    """Exact match links at dist 0 (min-id tie-break over duplicate
    names); a 1-char typo past the block prefix links at dist 1; an
    edit INSIDE the 2-char block prefix escapes linkage (the documented
    blocking recall tradeoff); distance > max_dist stays unlinked."""
    from gtfs2lc_spark import kg

    dictionary = spark.createDataFrame(
        [(10, "Main Street"), (11, "Main Street"), (20, "Market Square"),
         (30, "Harbor View")],
        ["id", "name"],
    )
    mentions = spark.createDataFrame(
        [
            (1, "main street"),     # exact after normalization -> 10 (min id)
            (2, "maim street"),     # 1 edit at pos 4 -> dist 1 -> 10
            (3, "XXin street"),     # edits inside block prefix -> no link
            (4, "mzzn street"),     # dist 2 > max_dist -> no link
            (5, "harbor  view!"),   # normalization collapse -> exact 30
        ],
        ["mention_id", "raw"],
    )
    got = {r["mention_id"]: (r["linked_id"], r["dist"])
           for r in kg.fuzzy_link(mentions, dictionary, max_dist=1).collect()}
    assert got == {1: (10, 0), 2: (10, 1), 5: (30, 0)}


def test_fuzzy_link_plan_broadcasts_dictionary(spark):
    from gtfs2lc_spark import kg
    from pyspark.sql import functions as F

    mentions = spark.range(0, 100).select(
        F.col("id").alias("mention_id"),
        F.concat(F.lit("name"), F.col("id")).alias("raw"),
    )
    dictionary = spark.range(0, 50).select(
        F.col("id").alias("id"), F.concat(F.lit("name"), F.col("id")).alias("name")
    )
    plan = (
        kg.fuzzy_link(mentions, dictionary)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hits_hubs_vs_authorities(spark):
    """Bipartite-ish graph: pure sources become hubs (authority 0),
    pure sinks become authorities (hub 0); L1 normalization sums to 1
    on each side; multi-edge contributes multiply."""
    from gtfs2lc_spark import kg

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3), (2, 5), (3, 5)], ["src", "dst"]
    )
    got = {r["node"]: (r["hub"], r["authority"])
           for r in kg.hits(edges, iterations=2).collect()}
    assert got[1] == (0.4, 0.0) and got[4] == (0.4, 0.0)   # hubs
    assert got[2] == (0.1, 0.4) and got[3] == (0.1, 0.4)   # authorities
    assert got[5] == (0.0, 0.2)
    assert round(sum(h for h, _ in got.values()), 6) == 1.0
    assert round(sum(a for _, a in got.values()), 6) == 1.0
    # doubling one edge shifts mass toward its endpoints
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3), (2, 5)], ["src", "dst"]
    )
    got2 = {r["node"]: r["authority"] for r in kg.hits(dup, iterations=1).collect()}
    assert got2[2] > got2[3]


def test_label_propagation_bridged_triangles(spark):
    """Two triangles joined by one bridge edge resolve into two
    distinct communities; the update is a pure function of the graph
    (synchronous rounds, (max count, min label) tie-break)."""
    from gtfs2lc_spark import kg

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["src", "dst"],
    )
    got = {r["node"]: r["label"]
           for r in kg.label_propagation(edges, iterations=3).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]
    # deterministic: identical on re-run
    again = {r["node"]: r["label"]
             for r in kg.label_propagation(edges, iterations=3).collect()}
    assert got == again


def test_clustering_coefficients_triangle_plus_pendant(spark):
    from gtfs2lc_spark import kg

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"])
    got = {r["node"]: (r["degree"], r["n_triangles"], r["coeff"])
           for r in kg.clustering_coefficients(edges).collect()}
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, round(1 / 3, 6))
    assert got[4] == (1, 0, 0.0)


def test_k_core_peels_chain_keeps_triangle(spark):
    from gtfs2lc_spark import kg

    # chain 1-2-3 feeding a triangle 3-4-5: 2-core = the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (3, 5)], ["src", "dst"]
    )
    got = sorted(tuple(r) for r in kg.k_core(edges, k=2).collect())
    assert got == [(3, 2), (4, 2), (5, 2)]
    # k above max degree -> empty core
    assert kg.k_core(edges, k=4).count() == 0


def test_personalized_pagerank_seeds_and_weights(spark):
    from gtfs2lc_spark import kg

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 3)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["rank"]
           for r in kg.personalized_pagerank(edges, seeds, iterations=3).collect()}
    # seed holds the most mass; everything reachable gets some
    assert got[1] == max(got.values())
    assert all(v >= 0 for v in got.values())
    # weighted single iteration: exact closed form
    we = spark.createDataFrame([(1, 2, 9.0), (1, 3, 1.0)], ["src", "dst", "wt"])
    got2 = {r["node"]: r["rank"]
            for r in kg.personalized_pagerank(
                we, seeds, iterations=1, weight_col="wt").collect()}
    assert got2 == {1: 0.15, 2: 0.765, 3: 0.085}


def test_neighbor_jaccard_square_and_hub_cap(spark):
    from gtfs2lc_spark import kg

    # 4-cycle: opposite corners share both neighbors (jaccard 1.0)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"])
    got = {(r["node_a"], r["node_b"]): (r["n_common"], r["jaccard"])
           for r in kg.neighbor_jaccard(edges).collect()}
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}
    # hub cap: star center 0 connected to 1..5 mints C(5,2)=10 pairs
    # uncapped; capping center degree below 5 drops them all
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    assert kg.neighbor_jaccard(star).count() == 10
    assert kg.neighbor_jaccard(star, max_center_degree=4).count() == 0


def test_personalized_pagerank_keeps_out_of_graph_seeds(spark):
    """A seed absent from the edge list still holds its teleport mass
    and appears in the output (review-r5 finding)."""
    from gtfs2lc_spark import kg

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (3,)], ["node"])
    got = {r["node"]: r["rank"]
           for r in kg.personalized_pagerank(edges, seeds, iterations=1).collect()}
    assert set(got) == {1, 2, 3}
    # node 3: teleport only = (1-0.85)*0.5
    assert got[3] == round(0.15 * 0.5, 6)
    # node 1 keeps its teleport share; node 2 receives 1's damped mass
    assert got[1] == round(0.15 * 0.5, 6)
    assert got[2] == round(0.85 * 0.5, 6)


def test_new_graph_operators_no_cartesian(spark):
    """Plan lock: none of the second-wave graph operators may contain
    a cartesian/broadcast-nested-loop product — wedge joins, peels and
    rank iterations are all equi-joins (the only sanctioned crossJoins
    carry 1-row scalar aggregates)."""
    from gtfs2lc_spark import kg
    from pyspark.sql import functions as F

    edges = spark.range(0, 300).select(
        (F.col("id") % 40).alias("src"), ((F.col("id") * 7 + 3) % 40).alias("dst")
    )
    seeds = spark.range(0, 5).select(F.col("id").alias("node"))
    plans = {
        "nj": kg.neighbor_jaccard(edges),
        "lpa": kg.label_propagation(edges, iterations=2),
        "cc": kg.clustering_coefficients(edges),
        "ppr": kg.personalized_pagerank(edges, seeds, iterations=2),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        # BroadcastNestedLoopJoin only ever against a 1-row scalar agg
        # (the PPR seed-count / L1-total pattern); reject row-expanding
        # nested loops by checking no BNLJ has a non-aggregate child
        for line in plan.splitlines():
            assert "BroadcastNestedLoopJoin" not in line or "Inner" in line, name

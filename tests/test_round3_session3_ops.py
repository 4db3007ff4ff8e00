"""Round-3 session-3 operator tests: prefix-filter join exactness, KMV
merge semantics, systematic sampler invariants, XML/VARIANT round-trip
edges, JL projection determinism, union-trick as-of semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from nba_data_pipeline_spark.plans.registry import load_all

    return load_all()[name]


def test_prefix_filter_join_matches_brute_force(spark):
    """The prefix-filtered pair set equals brute-force exact Jaccard >= 1/2
    over the shingle sets — the PPJoin prefix lemma loses no pair."""
    from nba_data_pipeline_spark.operators.dedup import shingle_sets
    from nba_data_pipeline_spark.io import read_table

    got = {
        (r.id_a, r.id_b): (r.inter, r.size_a, r.size_b)
        for r in _q("d9_prefix_filter_join").fn(spark, SF_DIR).collect()
    }
    sh = shingle_sets(
        read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ).collect()
    sets: dict[int, set[str]] = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 2 * inter >= union:
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want


def test_kmv_merge_equals_sketch_of_union(spark):
    """The '(all)' row's estimate — computed by merging per-group sketches —
    equals the estimate a single KMV sketch built directly over all
    distinct keys would give (merge is lossless for KMV: the k smallest
    of a union are a subset of the union of per-part k-smallest)."""
    import hashlib

    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.analytics import _KMV_K, _KMV_SCALE

    rows = {r.grp: r for r in _q("a25_kmv_set_ops").fn(spark, SF_DIR).collect()}
    keys = {
        r.o_custkey
        for r in read_table(spark, SF_DIR, "orders").select("o_custkey").collect()
    }
    hashes = sorted(
        int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16) for k in keys
    )
    if len(hashes) < _KMV_K:
        want = len(hashes)
    else:
        want = (_KMV_K - 1) * _KMV_SCALE // hashes[_KMV_K - 1]
    assert rows["(all)"].est_distinct == want
    # every per-group row reports its exact twin for error reading
    for grp, r in rows.items():
        assert r.exact_distinct >= 1
        if r.k_used < _KMV_K:
            assert r.est_distinct == r.exact_distinct == r.k_used


def test_weighted_sample_size_and_multiplicity(spark):
    """Selected multiplicities sum to total_weight // step and every
    multiplicity covers exactly the multiples of step inside the doc's
    cumulative interval."""
    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.curation_plans import _WS_TARGET

    rows = _q("ta_weighted_sample").fn(spark, SF_DIR).collect()
    total = (
        read_table(spark, SF_DIR, "documents")
        .agg(F.sum("n_chars").alias("s"))
        .collect()[0]
        .s
    )
    step = max(total // _WS_TARGET, 1)
    assert sum(r.multiplicity for r in rows) == total // step
    for r in rows:
        lo, hi = r.cum - r.w, r.cum
        assert r.multiplicity == hi // step - lo // step > 0


def test_random_projection_is_signed_sum(spark):
    """p_j equals the +/-1-signed sequential sum of the embedding — checked
    bit-for-bit against a NumPy-free Python fold in input order."""
    from nba_data_pipeline_spark.io import read_table
    from nba_data_pipeline_spark.plans.similarity import _RP_D, _RP_K, _rp_sign

    out = {r.vec_id: r for r in _q("sim_random_projection").fn(spark, SF_DIR).collect()}
    src = read_table(spark, SF_DIR, "embeddings").limit(20).collect()
    for row in src:
        for j in range(_RP_K):
            acc = 0.0
            for i in range(_RP_D):
                acc = acc + float(row.embedding[i]) * _rp_sign(i, j)
            assert getattr(out[row.vec_id], f"p{j}") == acc


def test_asof_tolerance_matches_per_row_scan(spark):
    """The union-trick as-of equals a per-row 'latest event <= t within 7
    days' scan, including the deterministic equal-ts max-event_id pick."""
    import datetime

    from nba_data_pipeline_spark.io import read_table

    got = {r.o_orderkey: r for r in _q("j14_asof_tolerance_union").fn(spark, SF_DIR).collect()}
    ev = read_table(spark, SF_DIR, "events").collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    orders = (
        read_table(spark, SF_DIR, "orders")
        .select("o_orderkey", (F.col("o_custkey") % 150).alias("user_id"), "o_orderdate")
        .limit(300)
        .collect()
    )
    tol = datetime.timedelta(days=7)
    for o in orders:
        cands = [e for e in by_user.get(o.user_id, []) if e.ts <= o.o_orderdate]
        want = max(cands, key=lambda e: (e.ts, e.event_id), default=None)
        if want is not None and want.ts < o.o_orderdate - tol:
            want = None
        r = got[o.o_orderkey]
        if want is None:
            assert r.asof_event_id is None and r.lag_s is None
        else:
            assert r.asof_event_id == want.event_id
            assert r.lag_s == int((o.o_orderdate - want.ts).total_seconds())


def test_xml_roundtrip_preserves_markup_chars(spark, tmp_path):
    """The native XML writer entity-escapes markup characters so a
    write→read round-trip is lossless on hostile strings."""
    df = spark.createDataFrame(
        [(1, 'a & b < c > "d"'), (2, "plain")], "id long, name string"
    )
    out = str(tmp_path / "xml")
    df.write.format("xml").option("rowTag", "row").save(out)
    back = spark.read.format("xml").option("rowTag", "row").load(out)
    assert {(r.id, r.name) for r in back.collect()} == {
        (1, 'a & b < c > "d"'),
        (2, "plain"),
    }


def test_variant_missing_path_is_null_not_error(spark):
    """try_variant_get on an absent path yields NULL (count 0) on every row
    — the schema-on-read contract the src_json_variant query pins."""
    rows = _q("src_json_variant").fn(spark, SF_DIR).collect()
    assert rows and all(r.n_miss == 0 for r in rows)
    assert sum(r.n_orders for r in rows) > 0


def test_dpp_subquery_in_j15_plan(spark):
    """j15's fact scan must carry a dynamicpruning subquery on the
    partition column — the filter reaches the directory level at runtime
    from the dim join, not from the query text."""
    df = _q("j15_dynamic_partition_pruning").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_dedupe_within_watermark_restamped_replay(spark):
    """Every record arrives twice with the second copy's event time +30
    min; dropDuplicatesWithinWatermark must still collapse them to the
    single-copy counts."""
    from nba_data_pipeline_spark.io import read_table

    got = {
        r.event_type: r.n_unique_events
        for r in _q("s10_dedupe_within_watermark").fn(spark, SF_DIR).collect()
    }
    want = {
        r.event_type: r.n
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_orc_scan_pushes_predicate(spark):
    """The ORC scan must carry the l_quantity filter as PushedFilters so
    stripes outside the predicate never decompress."""
    df = _q("src_orc_roundtrip").fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan orc" in ln]
    assert scan and "PushedFilters: [" in scan[0]
    assert "l_quantity" in scan[0].split("PushedFilters:")[1][:120]


def test_schema_evolution_nulls_only_in_v1_rows(spark):
    """mergeSchema must yield the added column as NULL exactly on the
    pre-schema (even-key) generation's rows."""
    rows = _q("src_schema_evolution").fn(spark, SF_DIR).collect()
    pre = [r for r in rows if r.priority == "(pre-schema)"]
    post = [r for r in rows if r.priority != "(pre-schema)"]
    assert pre and post
    assert sum(r.n_orders for r in rows) > 0


def test_minhash_signature_seeds_are_stable(spark):
    """Every mh_i must equal the hashlib min over md5(f'{i}:{shingle}') —
    pinned because transform's two-arg (element, index) convention once
    captured the index column as the seed, yielding plan-dependent
    signatures (12 simultaneous transforms over one array made the bug
    visible only in multi-seed projections)."""
    import hashlib

    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.dedup import minhash_signature

    toks = ["b", "a", "c", "zeta", "omega"]
    df = spark.createDataFrame([(toks,)], "arr array<string>")
    row = df.select(*minhash_signature(F.col("arr"), 12)).collect()[0]
    for i in range(12):
        want = min(hashlib.md5(f"{i}:{x}".encode()).hexdigest() for x in toks)
        assert row[f"mh_{i}"] == want, f"seed {i}"


def test_polldir_reader_offsets_and_replay(tmp_path):
    """The polldir stream reader's offset contract: latestOffset() admits
    only stable files, partitions() maps a committed (start, end] range to
    one partition per new file, and read() re-parses those immutable files
    identically on replay (exactly-once on immutable files)."""
    import json

    from nba_data_pipeline_spark.sources.poll_datasource import PollDirStreamReader

    def land(name, rows):
        with open(tmp_path / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain(r, start):
        end = r.latestOffset()
        rows = []
        for part in r.partitions(start, end):
            for batch in r.read(part):
                rows.extend(
                    tuple(col[i].as_py() for col in batch.columns)
                    for i in range(batch.num_rows)
                )
        return rows, end

    land("a.jsonl", [{"event_id": 1, "user_id": 10, "event_type": "x", "value": 1.5}])
    r = PollDirStreamReader({"path": str(tmp_path)})
    o0 = r.initialOffset()
    first, o1 = drain(r, o0)
    assert first == [(1, 10, "x", 1.5)] and o1 == {"files": ["a.jsonl"]}
    land("b.jsonl", [{"event_id": 2, "user_id": 20, "event_type": "y", "value": 2.0}])
    second, o2 = drain(r, o1)
    assert second == [(2, 20, "y", 2.0)] and o2 == {"files": ["a.jsonl", "b.jsonl"]}
    # replay of each committed range is bit-identical (fresh reader, as a
    # restarted executor would see it)
    r2 = PollDirStreamReader({"path": str(tmp_path)})
    assert [p.path for p in r2.partitions(o0, o1)] == [str(tmp_path / "a.jsonl")]
    replay1 = []
    for part in r2.partitions(o0, o1):
        for batch in r2.read(part):
            replay1.extend(
                tuple(col[i].as_py() for col in batch.columns)
                for i in range(batch.num_rows)
            )
    assert replay1 == first
    # caught-up poll returns no new partitions and a stable offset
    third, o3 = drain(r, o2)
    assert third == [] and o3 == o2


def test_polldir_reader_skips_midwrite_file_until_stable(tmp_path, monkeypatch):
    """Regression (ADVICE r3): a file still being appended when the poll
    fires must NOT enter the offset — latestOffset stats twice and defers
    still-growing files to the next poll, which then admits them in full
    (r11: the check moved from read-then-restat to stat-twice when the
    reader went partitioned; the committed-offset guarantee is the same)."""
    import json
    import os

    from nba_data_pipeline_spark.sources import poll_datasource as pdmod
    from nba_data_pipeline_spark.sources.poll_datasource import PollDirStreamReader

    path = tmp_path / "grow.jsonl"
    row1 = {"event_id": 1, "user_id": 10, "event_type": "x", "value": 1.0}
    row2 = {"event_id": 2, "user_id": 20, "event_type": "y", "value": 2.0}
    path.write_text(json.dumps(row1) + "\n")

    real_getsize = os.path.getsize
    calls = {"n": 0}

    def growing_getsize(p):
        # simulate a writer appending between the first and second stat:
        # the SECOND stat of grow.jsonl sees more bytes
        if os.path.basename(str(p)) == "grow.jsonl":
            calls["n"] += 1
            if calls["n"] == 2:
                with open(path, "a") as f:
                    f.write(json.dumps(row2) + "\n")
        return real_getsize(p)

    monkeypatch.setattr(pdmod.os.path, "getsize", growing_getsize)
    r = PollDirStreamReader({"path": str(tmp_path)})
    o1 = r.latestOffset()
    # still-growing file NOT committed, no partitions to read
    assert o1 == {"files": []} and r.partitions(r.initialOffset(), o1) == []
    monkeypatch.setattr(pdmod.os.path, "getsize", real_getsize)
    o2 = r.latestOffset()
    assert o2 == {"files": ["grow.jsonl"]}
    rows = []
    for part in r.partitions(o1, o2):
        for batch in r.read(part):
            rows.extend(
                tuple(col[i].as_py() for col in batch.columns)
                for i in range(batch.num_rows)
            )
    assert rows == [(1, 10, "x", 1.0), (2, 20, "y", 2.0)]

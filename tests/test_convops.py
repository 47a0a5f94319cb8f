"""Conversation-grain dedup: exact-duplicate and retry-prefix detection
over the input_hint transcript table, pinned with planted duplicates, a
pure-Python md5-chain parity check, and a hot-chain salt-spread test."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _planted(spark):
    """6 synthesized convs + an exact dup, two copies of a 3-turn prefix,
    and a middle-turn-modified copy (a near-miss that must NOT flag)."""
    from pdfparse_spark.pipeline.transcripts import synthesize

    df, _ = synthesize(spark, n_convs=6, turns_per_conv=5, seed=7)
    base = df.localCheckpoint(eager=True)
    dup = base.filter("conv_id='conv000001'").withColumn(
        "conv_id", F.lit("zz_dup")
    )
    pre = base.filter("conv_id='conv000002' and turn_idx < 3").withColumn(
        "conv_id", F.lit("zz_prefix")
    )
    pre2 = pre.withColumn("conv_id", F.lit("zz_prefix2"))
    mod = (
        base.filter("conv_id='conv000003'")
        .withColumn("conv_id", F.lit("zz_mod"))
        .withColumn(
            "text",
            F.when(F.col("turn_idx") == 1, F.lit("altered middle")).otherwise(
                F.col("text")
            ),
        )
    )
    return base, base.unionByName(dup).unionByName(pre).unionByName(
        pre2
    ).unionByName(mod)


def test_conv_chain_matches_pure_python(spark):
    """The JVM-side fold (md5 over \\x1f-joined role/text, chained md5 in
    turn order) must be bit-identical to hashlib — the chain IS the
    dedup key, so the convention must be reproducible outside Spark."""
    from pdfparse_spark.pipeline.convops import conv_chains

    base, t = _planted(spark)
    rows = sorted(
        base.filter("conv_id='conv000001'").collect(), key=lambda r: r["turn_idx"]
    )
    h, want_chain = "", []
    for r in rows:
        th = hashlib.md5(
            ("%s\x1f%s" % (r["role"], r["text"])).encode()
        ).hexdigest()
        h = hashlib.md5((h + th).encode()).hexdigest()
        want_chain.append(h)
    got = {r["conv_id"]: r for r in conv_chains(t).collect()}
    assert got["conv000001"]["chain"] == want_chain
    assert got["conv000001"]["n_turns"] == len(rows)
    assert got["zz_dup"]["chain"] == want_chain  # exact dup, same chain


def test_conv_dedup_exact_planted(spark):
    """Exact dup groups keep exactly their lexicographically-first member;
    a single-character turn change breaks the group."""
    from pdfparse_spark.pipeline.convops import conv_dedup_exact

    _, t = _planted(spark)
    out = {r["conv_id"]: r for r in conv_dedup_exact(t).collect()}
    assert len(out) == t.select("conv_id").distinct().count()
    assert (out["conv000001"]["keep"], out["conv000001"]["n_copies"]) == (True, 2)
    assert (out["zz_dup"]["keep"], out["zz_dup"]["canonical_id"]) == (
        False,
        "conv000001",
    )
    # the modified copy is its own group — content, not id, drives the key
    assert (out["zz_mod"]["keep"], out["zz_mod"]["n_copies"]) == (True, 1)
    # the two prefix copies dedup against each other at the exact grain
    assert out["zz_prefix"]["keep"] is True
    assert out["zz_prefix2"]["canonical_id"] == "zz_prefix"


def test_conv_prefix_dedup_planted(spark):
    """Strict-prefix copies flag (keep=false) with their container count;
    containers, equal-length exact dups, and modified near-misses all
    keep.  Composing with the exact grain: intersecting keeps drops
    zz_dup, zz_prefix, zz_prefix2 and keeps everything else."""
    from pdfparse_spark.pipeline.convops import (
        conv_dedup_exact,
        conv_prefix_dedup,
    )

    _, t = _planted(spark)
    out = {r["conv_id"]: r for r in conv_prefix_dedup(t).collect()}
    assert len(out) == t.select("conv_id").distinct().count()
    assert (out["zz_prefix"]["is_prefix"], out["zz_prefix"]["n_containers"]) == (
        True,
        1,
    )
    assert out["zz_prefix2"]["is_prefix"] is True
    assert out["conv000002"]["keep"] is True  # the completed attempt
    assert out["zz_mod"]["keep"] is True
    assert out["zz_dup"]["keep"] is True  # exact dup ≠ strict prefix
    ex = {r["conv_id"]: r["keep"] for r in conv_dedup_exact(t).collect()}
    dropped = {c for c in out if not (out[c]["keep"] and ex[c])}
    assert dropped == {"zz_dup", "zz_prefix", "zz_prefix2"}


def test_conv_prefix_hot_chain_spreads_and_stays_linear(spark):
    """The retry-storm case: 48 abandoned copies and 16 completions of ONE
    session.  The probe join must (a) flag all 48 with n_containers=16,
    (b) spread the hot chain's probe rows across reducers (fused h:salt
    key), and (c) pair via the pre-aggregated (value, count) table — the
    executed plan carries no row-pairing join of copies × completions."""
    from pdfparse_spark.pipeline.convops import _CONV_SALT, conv_prefix_dedup

    rows = []
    for c in range(48):
        for t in range(3):
            rows.append(("ab%03d" % c, t, "user", "turn %d" % t, "", None))
    for c in range(16):
        for t in range(5):
            rows.append(("full%03d" % c, t, "user", "turn %d" % t, "", None))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(coalesce_key, "true")
    prev_b = spark.conf.get(bcast_key)
    try:
        # at 10^12 turns the prefix table is corpus-sized, not
        # broadcastable — force the shuffle join the production plan
        # would use and observe the salted key distribution
        spark.conf.set(coalesce_key, "false")
        spark.conf.set(bcast_key, "-1")
        out = conv_prefix_dedup(df).withColumn("pid", F.spark_partition_id())
        got = out.collect()
    finally:
        spark.conf.set(coalesce_key, prev)
        spark.conf.set(bcast_key, prev_b)
    by_id = {r["conv_id"]: r for r in got}
    assert len(by_id) == 64
    for c in range(48):
        r = by_id["ab%03d" % c]
        assert (r["is_prefix"], r["n_containers"], r["keep"]) == (True, 16, False)
    for c in range(16):
        assert by_id["full%03d" % c]["keep"] is True
    pids = {r["pid"] for r in got if r["is_prefix"]}
    assert len(pids) >= min(4, _CONV_SALT)


def test_conv_dedup_filter_planted(spark):
    """The composed pre-extraction filter drops exactly the exact-dup and
    prefix copies, keeps every surviving turn intact, and releases the
    chains checkpoint before returning (only the small drop set stays)."""
    from pdfparse_spark.pipeline.convops import conv_dedup_filter

    _, t = _planted(spark)
    pre = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    filtered, stats = conv_dedup_filter(t)
    post = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    assert stats == {"n_convs": 10, "n_convs_dropped": 3}
    # only the drop-set checkpoint survives the call, not the corpus-wide
    # chains frame
    assert len(post - pre) <= 1
    kept = {r["conv_id"] for r in filtered.select("conv_id").distinct().collect()}
    assert kept == {"conv%06d" % i for i in range(6)} | {"zz_mod"}
    want = t.filter(
        ~F.col("conv_id").isin("zz_dup", "zz_prefix", "zz_prefix2")
    ).count()
    assert filtered.count() == want


def test_conv_chain_null_text_convention(spark):
    """NULL role/text hash as empty strings (coalesced BEFORE the \\x1f
    join — concat_ws would silently drop the NULL and its separator),
    keeping the chain reproducible outside Spark on nullable columns."""
    from pdfparse_spark.pipeline.convops import conv_chains

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", None, "", None),
            ("c1", 1, None, "hi", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    h, want = "", []
    for role, text in [("user", ""), ("", "hi")]:
        th = hashlib.md5(("%s\x1f%s" % (role, text)).encode()).hexdigest()
        h = hashlib.md5((h + th).encode()).hexdigest()
        want.append(h)
    got = conv_chains(df).collect()[0]
    assert got["chain"] == want and got["n_turns"] == 2


def test_conv_index_lifecycle(spark, tmp_path):
    """build → probe → extend → re-probe: an indexed session, its exact
    re-ingest, and a strict prefix of it are all screened out; a new
    session, a modified copy, and an EXTENSION of an indexed session
    (the documented asymmetry) pass; extending is idempotent by value."""
    from pdfparse_spark.pipeline.conv_index import (
        build_conv_index,
        extend_conv_index,
        probe_conv_index,
    )

    base, _ = _planted(spark)  # 6 clean synthesized conversations
    idx = str(tmp_path / "cidx")
    stats = build_conv_index(spark, base, idx)
    assert stats["n_chain_values"] == 6 * 5  # all distinct, all positions

    # same corpus re-probed: everything is in_index
    again = {r["conv_id"]: r["in_index"] for r in probe_conv_index(spark, base, idx).collect()}
    assert all(again.values()) and len(again) == 6

    dup = base.filter("conv_id='conv000001'").withColumn("conv_id", F.lit("zz_dup"))
    pre = base.filter("conv_id='conv000002' and turn_idx < 3").withColumn(
        "conv_id", F.lit("zz_prefix")
    )
    ext = base.filter("conv_id='conv000004'").unionByName(
        spark.createDataFrame(
            [("conv000004", 99, "user", "a brand new closing turn", "", None)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
    ).withColumn("conv_id", F.lit("zz_ext"))
    mod = (
        base.filter("conv_id='conv000003'")
        .withColumn("conv_id", F.lit("zz_mod"))
        .withColumn(
            "text",
            F.when(F.col("turn_idx") == 1, F.lit("altered")).otherwise(F.col("text")),
        )
    )
    inc = dup.unionByName(pre).unionByName(ext).unionByName(mod)
    got = {
        r["conv_id"]: (r["in_index"], r["keep"])
        for r in probe_conv_index(spark, inc, idx).collect()
    }
    assert got == {
        "zz_dup": (True, False),
        "zz_prefix": (True, False),
        "zz_ext": (False, True),
        "zz_mod": (False, True),
    }

    # extend with the increment: only genuinely new values append; the
    # extension shares its first 5 positions with conv000004, so it adds
    # exactly 1; the modified copy diverges at turn 1, adding 4
    st1 = extend_conv_index(spark, inc, idx)
    assert st1["n_added"] == 1 + 4
    st2 = extend_conv_index(spark, inc, idx)  # idempotent by value
    assert st2["n_added"] == 0
    re = {
        r["conv_id"]: r["in_index"]
        for r in probe_conv_index(spark, inc, idx).collect()
    }
    assert re == {"zz_dup": True, "zz_prefix": True, "zz_ext": True, "zz_mod": True}


def test_conv_index_tag_guard(spark, tmp_path, monkeypatch):
    """An index built under a different chain convention must be refused
    at probe time — the lifecycle-wide seed/tag lesson."""
    from pdfparse_spark.pipeline import conv_index as ci

    base, _ = _planted(spark)
    idx = str(tmp_path / "m")
    ci.build_conv_index(spark, base, idx)
    monkeypatch.setattr(ci, "_FEAT_TAG", "conv-sha256chain-v2")
    with pytest.raises(ValueError, match="chain convention"):
        ci.probe_conv_index(spark, base, idx)

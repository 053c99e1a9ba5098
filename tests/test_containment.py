"""Containment detector vs brute-force turn-boundary substring oracle."""

from __future__ import annotations

from itertools import combinations

import pytest

from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus
from fastq_dupaway_spark.canonicalize import conversation_texts
from fastq_dupaway_spark.detectors.containment import (
    containment_pairs,
    prefix_containment_pairs,
)

_US = "\x1f"


def _brute_containment(convs):
    out = set()
    texts = {cid: _US.join(t) for cid, t in convs}
    suffixes = {
        cid: [_US.join(t[k:]) for k in range(len(t))] for cid, t in convs
    }
    for (a, _), (b, _) in combinations(convs, 2):
        if any(s.startswith(texts[a]) for s in suffixes[b]) or any(
            s.startswith(texts[b]) for s in suffixes[a]
        ):
            out.add(tuple(sorted((a, b))))
    return out


def _brute_prefix(convs):
    out = set()
    texts = {cid: _US.join(t) for cid, t in convs}
    for (a, _), (b, _) in combinations(convs, 2):
        if texts[b].startswith(texts[a]) or texts[a].startswith(texts[b]):
            out.add(tuple(sorted((a, b))))
    return out


def _pairs(df):
    return {tuple(sorted((r["conv_a"], r["conv_b"]))) for r in df.collect()}


def test_containment_matches_brute_force(spark):
    convs = [
        ("c1", ["alpha beta", "gamma delta"]),
        ("c2", ["gamma delta"]),                       # == suffix(c1, 1)
        ("c3", ["alpha beta", "gamma delta", "eps"]),  # c1 prefix of c3
        ("c4", ["beta gamma"]),                        # no turn-aligned hit
        ("c5", ["alpha beta"]),                        # prefix of c1/c3
        ("c6", ["zzz unrelated text entirely"]),
    ]
    got = _pairs(containment_pairs(conversation_texts(corpus.conv_df(spark, convs))))
    want = _brute_containment(convs)
    assert got == want
    assert ("c1", "c2") in got and ("c1", "c3") in got and ("c1", "c5") in got
    assert not any("c4" in p for p in got)


def test_containment_on_generated_corpus(spark):
    convs = corpus.generate_corpus(seed=17, n_conv=80, dup_rate=0.5)
    ct = conversation_texts(corpus.conv_df(spark, convs))
    assert _pairs(containment_pairs(ct)) == _brute_containment(convs)


def test_prefix_containment_matches_reference_relation(spark):
    convs = corpus.FIXTURES["single_loose"]
    ct = conversation_texts(corpus.conv_df(spark, convs))
    got = _pairs(prefix_containment_pairs(ct))
    assert got == _brute_prefix(convs)
    assert got == {
        ("00001", "00002"),
        ("00001", "00004"),
        ("00002", "00004"),
    }


def test_short_needle_recall(spark):
    """Needles shorter than the block width must still be found."""
    convs = [
        ("n1", ["ab"]),
        ("n2", ["ab", "very long second turn goes here beyond width"]),
        ("n3", ["cd"]),
    ]
    ct = conversation_texts(corpus.conv_df(spark, convs))
    got = _pairs(containment_pairs(ct))
    assert ("n1", "n2") in got
    assert not any("n3" in p for p in got)


def test_tiered_prefix_blocking_boundaries(spark):
    """r6 two-tier probe key (PREFIX_LEN short tier + PREFIX_LEN_LONG
    selective tier): needles/containers at every tier boundary length
    (PREFIX_LEN-1 .. +1, PREFIX_LEN_LONG-1 .. +1) must match brute force
    exactly — the off-by-one surface of the k_probe CASE and the block
    side's conditional long-tier row."""
    from fastq_dupaway_spark.detectors.containment import (
        PREFIX_LEN,
        PREFIX_LEN_LONG,
    )

    convs = []
    for ln in (
        1, PREFIX_LEN - 1, PREFIX_LEN, PREFIX_LEN + 1,
        PREFIX_LEN_LONG - 1, PREFIX_LEN_LONG, PREFIX_LEN_LONG + 1,
        PREFIX_LEN_LONG + 40,
    ):
        body = ("x" * (PREFIX_LEN_LONG + 60))[:ln]
        convs.append((f"a{ln:03d}", [body]))            # needle of length ln
        convs.append((f"b{ln:03d}", [body + " tail extension beyond"]))
        convs.append((f"c{ln:03d}", ["pre turn", body]))  # boundary-1 container
    got = _pairs(containment_pairs(conversation_texts(corpus.conv_df(spark, convs))))
    assert got == _brute_containment(convs)


class TestCharContainment:
    """char_containment_pairs: mid-turn generalized substring containment
    vs a brute-force composite-in-composite oracle."""

    CONVS = [
        # mid-turn single-turn needle (len >= 16)
        ("n_single", ["hello wonderful world"]),
        ("c_single", ["AA hello wonderful world BB", "another turn"]),
        # short single-turn needle: mid-turn occurrence found by the
        # broadcast locate() probe (round-2 carve-out removed), boundary
        # occurrence by the suffix blocks
        ("n_short", ["tiny txt"]),
        ("c_short_mid", ["ZZ tiny txt YY"]),
        ("c_short_bnd", ["tiny txt and more trailing words"]),
        # mid-turn multi-turn needle: head suffix + exact middle + prefix
        ("n_multi", ["tail of first", "second turn here", "thi"]),
        ("c_multi", ["PREFIX tail of first", "second turn here", "third turn more"]),
        # near miss: head not a suffix of the preceding turn
        ("c_miss", ["PREFIX tail of firstX", "second turn here", "third turn more"]),
        # boundary containment regression
        ("n_bound", ["second turn here", "thi"]),
        ("unrelated", ["completely different content words"]),
    ]

    def _brute(self):
        """Pure composite-in-composite — NO carve-out (the short-needle
        boundary-only rule died with the broadcast locate probe)."""
        us = "\x1f"
        comp = {cid: us.join(turns) for cid, turns in self.CONVS}
        return {
            tuple(sorted((a, b)))
            for a in comp
            for b in comp
            if a != b and comp[a] in comp[b]
        }

    def test_matches_brute_force(self, spark):
        from fastq_dupaway_spark.detectors.containment import (
            char_containment_pairs,
        )

        t = corpus.conv_df(spark, self.CONVS)
        ct = conversation_texts(t)
        got = {
            tuple(sorted((r["conv_a"], r["conv_b"])))
            for r in char_containment_pairs(ct).collect()
        }
        want = self._brute()
        assert got == want
        # the interesting cases actually occur
        assert ("c_single", "n_single") in want     # mid-turn single
        assert ("c_multi", "n_multi") in want       # mid-turn multi
        assert ("c_short_bnd", "n_short") in want   # short at boundary
        assert ("c_short_mid", "n_short") in want   # short MID-TURN (new)
        assert ("c_miss", "n_multi") not in want

    def test_short_needle_cap_surfaced(self, spark):
        """Short needles beyond the broadcast cap are surfaced (ordered,
        deterministic), and the capped run still finds the probed ones."""
        from fastq_dupaway_spark.detectors.containment import (
            char_containment_pairs,
            unindexed_short_needles,
        )

        convs = [(f"s{i}", [f"nd{i}"]) for i in range(6)] + [
            ("big", ["xx nd0 yy nd5 zz this container is long enough"]),
        ]
        ct = conversation_texts(corpus.conv_df(spark, convs))
        left_out = {
            r["conv_id"] for r in unindexed_short_needles(ct, max_short=3).collect()
        }
        assert left_out == {"s3", "s4", "s5"}  # smallest-id cap is deterministic
        got = {
            tuple(sorted((r["conv_a"], r["conv_b"])))
            for r in char_containment_pairs(ct, max_short=3).collect()
        }
        assert ("big", "s0") in got          # probed needle found mid-turn
        assert ("big", "s5") not in got      # beyond cap: surfaced, not probed


class TestGramStride:
    """The strided gram index is EXACT at every stride (the mod-s
    alignment proof in _gram_path_pairs): needles at every length around
    the GRAM_LEN / GRAM_LEN+stride-1 boundary, placed at every container
    offset residue mod stride, yield the identical pair relation as the
    dense stride-1 index and the brute-force oracle."""

    def _convs(self):
        base = "abcdefghijklmnopqrstuvwxyz0123456789"  # 36 chars, all distinct
        convs = []
        # needles straddling the scan/gram-path boundary for strides 1..5:
        # lengths GRAM_LEN-2 .. GRAM_LEN+5 (14..21)
        for length in range(14, 22):
            convs.append((f"needle{length:02d}", [base[:length]]))
        # containers shifting the occurrence through every offset mod 5
        for off in range(6):
            convs.append((f"cont{off}", ["x" * off + base + " trailing words"]))
        # a needle that appears in NO container
        convs.append(("miss", ["zzzz_not_present_zzzz"]))
        return convs

    def _brute(self, convs):
        us = "\x1f"
        comp = {cid: us.join(t) for cid, t in convs}
        return {
            tuple(sorted((a, b)))
            for a in comp
            for b in comp
            if a != b and comp[a] in comp[b]
        }

    @pytest.mark.parametrize("stride", [1, 2, 4, 5])
    def test_stride_exact_at_every_offset(self, spark, stride):
        from fastq_dupaway_spark.detectors.containment import (
            char_containment_pairs,
        )

        convs = self._convs()
        ct = conversation_texts(corpus.conv_df(spark, convs))
        got = {
            tuple(sorted((r["conv_a"], r["conv_b"])))
            for r in char_containment_pairs(ct, gram_stride=stride).collect()
        }
        want = self._brute(convs)
        assert got == want
        # every (needle, container) pair is actually in the relation
        assert all(
            (f"cont{off}", f"needle{ln:02d}") in {tuple(sorted(p)) for p in want}
            for off in range(6)
            for ln in range(14, 22)
        )


def test_shared_suffix_blocks_paths_identical(spark):
    """Round-5 verdict item 2: the union-pruned shared suffix-block table
    yields exactly the same boundary-path and tail-path pairs as each
    path's standalone build (superset pruning + union salt sizing are
    recall/precision-neutral), with ONE localCheckpoint instead of two."""
    from fastq_dupaway_spark.detectors import containment as C

    convs = [
        ("c1", ["alpha beta", "gamma delta"]),
        ("c2", ["gamma delta"]),
        ("c3", ["seed alpha beta", "gamma delta", "eps"]),  # tail-path hit for c1
        ("c4", ["beta gamma"]),
        ("c5", ["alpha beta"]),
        ("c6", ["xx alpha beta", "gamma delta"]),  # another tail-path hit
        ("c7", ["zzz unrelated text entirely"]),
    ]
    ct = conversation_texts(corpus.conv_df(spark, convs)).localCheckpoint()
    shared = C._shared_suffix_blocks(ct, max_bucket=3)  # tiny cap: forces salting
    base_shared = _pairs(C.containment_pairs(ct, max_bucket=3, shared_blocks=shared))
    tail_shared = _pairs(C._tail_path_pairs(ct, max_bucket=3, shared_blocks=shared))
    base_alone = _pairs(C.containment_pairs(ct, max_bucket=3))
    tail_alone = _pairs(C._tail_path_pairs(ct, max_bucket=3))
    assert base_shared == base_alone
    assert tail_shared == tail_alone
    assert ("c1", "c3") in tail_shared and ("c1", "c6") in tail_shared


class TestSampledExtremeTier:
    """char_containment_pairs(sampled=True) — the documented recall<1
    extreme tier (round-5 verdict item 6). At stride 8, a planted
    single-turn needle of length L in [GRAM_LEN, GRAM_LEN+stride-1)
    covers c = L - GRAM_LEN + 1 of the 8 offset residues, so of its 8
    occurrences (one per pad residue, none boundary-aligned) EXACTLY c
    are found — a deterministic per-needle recall of c/8. Precision
    stays 1.0 (exact locate verify), long needles stay exact, and the
    gram index shrinks ~stride-fold (the cost side of the trade)."""

    STRIDE = 8
    LENGTHS = (16, 18, 20, 23)  # coverage c = 1, 3, 5, 8(=exact)

    def _convs(self):
        base = "abcdefghijklmnopqrstuvwxyz0123456789"  # 36 distinct chars
        convs = []
        for i, ln in enumerate(self.LENGTHS):
            # distinct leading char per length: needles never occur in
            # another length's containers, so recall counts are per-needle
            needle = chr(ord("A") + i) + base[: ln - 1]
            convs.append((f"needle{ln}", [needle]))
            for pad in range(1, self.STRIDE + 1):  # pads 1..8: every
                # residue mod 8, none boundary-aligned (pure gram path)
                convs.append(
                    (f"cont{ln}_{pad}", ["x" * pad + needle + " tail filler"])
                )
        return convs

    def _planted(self, found_pairs):
        """(length -> found-container count) over the planted relation."""
        per_len = {ln: 0 for ln in self.LENGTHS}
        for ln in self.LENGTHS:
            for pad in range(1, self.STRIDE + 1):
                if tuple(sorted((f"needle{ln}", f"cont{ln}_{pad}"))) in found_pairs:
                    per_len[ln] += 1
        return per_len

    def test_recall_cost_tradeoff_vs_exact(self, spark):
        from fastq_dupaway_spark.detectors.containment import (
            GRAM_LEN,
            _gram_index,
            char_containment_pairs,
        )

        convs = self._convs()
        ct = conversation_texts(corpus.conv_df(spark, convs)).localCheckpoint()

        exact = _pairs(char_containment_pairs(ct, gram_stride=self.STRIDE))
        sampled = _pairs(
            char_containment_pairs(ct, gram_stride=self.STRIDE, sampled=True)
        )

        # precision 1.0: sampled is a SUBSET of the exact relation
        assert sampled <= exact
        # exact mode finds every planted occurrence regardless of stride
        assert self._planted(exact) == {ln: self.STRIDE for ln in self.LENGTHS}
        # sampled recall is the PREDICTED alignment coverage c/stride,
        # deterministically: c = min(stride, L - GRAM_LEN + 1) pads found
        want = {
            ln: min(self.STRIDE, ln - GRAM_LEN + 1) for ln in self.LENGTHS
        }
        assert self._planted(sampled) == want
        # needles at len >= GRAM_LEN + stride - 1 remain EXACT when sampled
        assert want[23] == self.STRIDE

        # cost side: the strided index is ~stride-fold smaller than dense
        dense_rows = _gram_index(ct, 1).count()
        strided_rows = _gram_index(ct, self.STRIDE).count()
        assert strided_rows * 6 < dense_rows, (strided_rows, dense_rows)


class TestNeedleKeyFallback:
    """broadcast_needles=False (the beyond-~10^8-conversation tier,
    DedupConfig.broadcast_needle_keys / --no-broadcast-needles): the
    needle-key pushdown must run as a co-partitioned shuffled-hash
    semi-join and yield the IDENTICAL pair relation — recall 1.0 is by
    construction (candidates/verify unchanged), pinned here anyway."""

    def test_plan_shape(self, spark):
        from fastq_dupaway_spark.detectors.containment import (
            _needle_key_semi_join,
        )

        blocks = spark.range(100).select(
            F.col("id").alias("ph"), F.lit("c").alias("container_id")
        )
        keys = spark.range(10).select(F.col("id").alias("ph"))

        def plan(broadcast):
            df = _needle_key_semi_join(blocks, keys, "ph", broadcast)
            return df._jdf.queryExecution().executedPlan().toString()

        assert "BroadcastHashJoin" in plan(True)
        fb = plan(False)
        assert "ShuffledHashJoin" in fb
        assert "BroadcastHashJoin" not in fb

    def test_identical_pairs_both_strategies(self, spark):
        from fastq_dupaway_spark.detectors.containment import (
            char_containment_pairs,
        )

        convs = corpus.generate_corpus(seed=23, n_conv=60, dup_rate=0.5)
        ct = conversation_texts(corpus.conv_df(spark, convs)).localCheckpoint()
        assert _pairs(containment_pairs(ct, broadcast_needles=False)) == _pairs(
            containment_pairs(ct)
        ) == _brute_containment(convs)
        assert _pairs(
            char_containment_pairs(ct, broadcast_needles=False)
        ) == _pairs(char_containment_pairs(ct))

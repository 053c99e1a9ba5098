"""Pure-Python reference-semantics oracle.

Re-derives the observable behavior of fastq-dupaway's dedup passes on
in-memory transcript conversations, so the Spark pipeline's outputs can be
parity-checked without the C++ binary. Each function cites the reference
lines (file:line under /root/reference) whose semantics it reproduces.

A *conversation* is `(conv_id, [turn_text_0, turn_text_1, ...])` — the
transcript recast of a single-end read (1 turn) or a paired-end fragment
(2 turns), generalized to k turns (SURVEY.md §1.5).

Semantics reproduced:

- comparators tight/loose/hamming, single + paired, incl. loose
  same-sidedness (src/comparator.cpp:45-91);
- seq-based sorted-adjacency scan with last-kept-reference (hamming) /
  longest-reference-update (loose) behavior (src/seq_dup_remover.hpp:54-109,
  131-218) — clusters are runs in sort order, NOT transitive closures;
- fast-mode first-seen-wins hash distinct preserving input order
  (src/hash_dup_remover.hpp:105-148, 194-255);
- unordered-mode id-sort + inner merge-join + fast dedup
  (src/hash_dup_remover.hpp:257-346).

Tie-break between byte-identical conversations is unspecified in the
reference (std::sort is unstable); we pin min(conv_id) everywhere
(SURVEY.md §7.3.2) and the Spark engine does the same.
"""

from __future__ import annotations

from dataclasses import dataclass, field

Conversation = tuple[str, list[str]]  # (conv_id, [turn texts in turn_idx order])


# ---------------------------------------------------------------------------
# Comparators (src/comparator.cpp:45-91)
# ---------------------------------------------------------------------------

def tight_equal(a: str, b: str) -> bool:
    """P1: dup <=> exact string equality (src/comparator.cpp:45-49)."""
    return a == b


def loose_contained(a: str, b: str) -> bool:
    """P3: dup <=> shorter is a prefix of longer (src/comparator.cpp:60-63)."""
    if len(a) <= len(b):
        return b.startswith(a)
    return a.startswith(b)


def hamming_distance(a: str, b: str) -> int:
    """src/seq_utils.cpp:65-72 (defined for equal lengths only)."""
    return sum(1 for x, y in zip(a, b) if x != y)


def hamming_close(a: str, b: str, d: int) -> bool:
    """P5: dup <=> equal length and hamming <= d (src/comparator.cpp:76-82)."""
    return len(a) == len(b) and hamming_distance(a, b) <= d


def conv_dup(ref: list[str], cur: list[str], mode: str, d: int = 2) -> bool:
    """Conversation-level (k-turn) generalization of the paired comparators.

    dup <=> same turn count AND every aligned turn passes the per-turn
    predicate (src/comparator.cpp:51-58 tight, :84-91 hamming). Loose adds
    the same-sidedness constraint: every turn's length comparison must point
    the same way (src/comparator.cpp:65-74, the `(ref_l<=l1 && ref_r<=l2) ||
    (ref_l>l1 && ref_r>l2)` guard generalized to k turns).
    """
    if len(ref) != len(cur):
        return False
    if mode == "tight":
        return all(tight_equal(r, c) for r, c in zip(ref, cur))
    if mode == "hamming":
        return all(hamming_close(r, c, d) for r, c in zip(ref, cur))
    if mode == "loose":
        if not all(loose_contained(r, c) for r, c in zip(ref, cur)):
            return False
        all_le = all(len(r) <= len(c) for r, c in zip(ref, cur))
        all_gt = all(len(r) > len(c) for r, c in zip(ref, cur))
        return all_le or all_gt
    raise ValueError(f"unknown mode {mode!r}")


# ---------------------------------------------------------------------------
# Result container
# ---------------------------------------------------------------------------

@dataclass
class DedupResult:
    survivors: list[str] = field(default_factory=list)  # conv_ids, output order
    # cluster head conv_id -> member conv_ids (dups dropped into that head's
    # cluster, head itself excluded), insertion-ordered like ClusterFile
    # (src/file_utils.cpp:96-112).
    clusters: dict[str, list[str]] = field(default_factory=dict)

    @property
    def survivor_set(self) -> set[str]:
        return set(self.survivors)

    def dup_pairs(self) -> set[tuple[str, str]]:
        """Same-cluster relation as unordered pairs (recall metric base)."""
        pairs: set[tuple[str, str]] = set()
        for head, members in self.clusters.items():
            group = [head, *members]
            for i in range(len(group)):
                for j in range(i + 1, len(group)):
                    a, b = sorted((group[i], group[j]))
                    pairs.add((a, b))
        return pairs


# ---------------------------------------------------------------------------
# Seq-based mode: sort by text, adjacent-scan (src/seq_dup_remover.hpp)
# ---------------------------------------------------------------------------

def seq_dedup(convs: list[Conversation], mode: str, d: int = 2) -> DedupResult:
    """Sequence-based dedup scan, SE/PE unified over k-turn conversations.

    Sort by the tuple of turn texts (composite lexicographic order,
    src/paired_external_sort.hpp:14-34), then a single forward scan:
    record 0 survives and becomes the reference; each later record that is
    a dup of the reference is dropped into the current cluster; otherwise
    it survives and becomes the new reference
    (src/seq_dup_remover.hpp:54-109).

    Loose-mode extra: on a dup, if every turn of the current record is at
    least as long as the reference's, the current record replaces the
    reference while the earlier survivor remains the cluster head
    (src/seq_dup_remover.hpp:92-98, :194-202) — chains extend through the
    longest member. Hamming mode never updates the reference on a dup, so
    clusters are runs judged against the last survivor (non-transitive).
    """
    ordered = sorted(convs, key=lambda c: (c[1], c[0]))  # texts, then conv_id
    result = DedupResult()
    if not ordered:
        return result
    head_id, ref = ordered[0][0], ordered[0][1]
    result.survivors.append(head_id)
    result.clusters[head_id] = []
    for conv_id, turns in ordered[1:]:
        if conv_dup(ref, turns, mode, d):
            result.clusters[head_id].append(conv_id)
            if mode == "loose" and all(
                len(c) >= len(r) for r, c in zip(ref, turns)
            ):
                ref = turns  # longest member carries the chain
        else:
            head_id, ref = conv_id, turns
            result.survivors.append(conv_id)
            result.clusters[conv_id] = []
    result.clusters = {h: m for h, m in result.clusters.items()}
    return result


# ---------------------------------------------------------------------------
# Fast mode: first-seen-wins exact dedup, input order
# (src/hash_dup_remover.hpp:105-148 SE, :194-255 PE)
# ---------------------------------------------------------------------------

def fast_dedup(convs: list[Conversation]) -> DedupResult:
    result = DedupResult()
    seen: dict[tuple[str, ...], str] = {}
    for conv_id, turns in convs:
        key = tuple(turns)
        if key in seen:
            result.clusters[seen[key]].append(conv_id)
        else:
            seen[key] = conv_id
            result.survivors.append(conv_id)
            result.clusters[conv_id] = []
    return result


# ---------------------------------------------------------------------------
# Unordered mode: per-turn streams re-synced by conv_id, then fast dedup
# (src/hash_dup_remover.hpp:257-346)
# ---------------------------------------------------------------------------

def unordered_dedup(
    stream0: list[tuple[str, str]], stream1: list[tuple[str, str]]
) -> DedupResult:
    """stream_k = [(conv_id, turn_k_text), ...] in arbitrary order.

    Reference: external-sort both files by id tag
    (src/hash_dup_remover.hpp:160-177), two-pointer inner merge-join
    dropping unmatched ids (:279-315), then the same hash-membership exact
    dedup over the joined stream — so output order is id-sorted and ids
    missing from either side vanish.
    """
    left = dict(sorted(stream0))
    right = dict(sorted(stream1))
    joined: list[Conversation] = [
        (cid, [left[cid], right[cid]]) for cid in sorted(left.keys() & right.keys())
    ]
    return fast_dedup(joined)

"""Property tests (hypothesis) for the algebraic identities the
session-4 operators rely on.  Engine execution is pinned separately
(oracle parity + behavioral tests); these pin the MATH -- the
string-fold BPE merge, the bucket-offset running-sum decomposition,
and the gaps-and-islands trick -- against brute-force references on
adversarial random inputs, pure-python and fast."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

SEP = "\x1f"


def _fold_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Python mirror of the Catalyst fold in operators.text._bpe_train:
    string accumulator, append `right` directly when the accumulator's
    last element equals `left`."""
    if not syms:
        return []
    acc = syms[0]
    for s in syms[1:]:
        if s == right and (acc == left or acc.endswith(SEP + left)):
            acc += right
        else:
            acc += SEP + s
    return acc.split(SEP)


def _scan_merge(syms: list[str], left: str, right: str) -> list[str]:
    """The spec: greedy left-to-right merge application."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa"]), max_size=12),
    left=st.sampled_from(["a", "b", "ab", "aa"]),
    right=st.sampled_from(["a", "b", "ab", "aa"]),
)
def test_bpe_fold_equals_greedy_scan(syms, left, right):
    """The fold must equal the greedy scan on every symbol sequence,
    including runs of the pair and symbols equal to concatenations of
    other symbols (the ambiguity the fold's suffix check resolves)."""
    assert _fold_merge(syms, left, right) == _scan_merge(syms, left, right)


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),  # quality*1000 (already bucketed grain)
            st.integers(min_value=0, max_value=50),    # n_tokens
        ),
        max_size=30,
    )
)
def test_bucket_offset_cumsum_equals_global_prefix_sum(docs):
    """token_budget_select's decomposition: within-bucket running sum
    plus strictly-better-bucket offset == the single global prefix
    sum over (quality desc, doc_id asc), for any quality ties."""
    rows = [(q, n, i) for i, (q, n) in enumerate(docs)]
    order = sorted(rows, key=lambda r: (-r[0], r[2]))
    cum, want = 0, {}
    for q, n, i in order:
        cum += n
        want[i] = cum
    # two-phase: bucket = q (grain == ordering key granularity here,
    # the worst case for tie handling)
    from collections import defaultdict

    btot = defaultdict(int)
    for q, n, i in rows:
        btot[q] += n
    got = {}
    for bucket in btot:
        offset = sum(t for b, t in btot.items() if b > bucket)
        run = 0
        for q, n, i in sorted(
            (r for r in rows if r[0] == bucket), key=lambda r: (-r[0], r[2])
        ):
            run += n
            got[i] = offset + run
    assert got == want


@settings(max_examples=300, deadline=None)
@given(pos=st.sets(st.integers(min_value=1, max_value=60), max_size=25))
def test_gaps_and_islands_identity(pos):
    """contam_span_report's grouping key: pos - rank(pos) is constant
    exactly within each maximal run of consecutive positions."""
    ordered = sorted(pos)
    groups = {}
    for rank, p in enumerate(ordered, start=1):
        groups.setdefault(p - rank, []).append(p)
    # reference: direct scan for maximal runs
    runs, cur = [], []
    for p in ordered:
        if cur and p == cur[-1] + 1:
            cur.append(p)
        else:
            if cur:
                runs.append(cur)
            cur = [p]
    if cur:
        runs.append(cur)
    assert sorted(map(tuple, groups.values())) == sorted(map(tuple, runs))


# ---------------------------------------------------------------- #
# Batched BPE (r6): multi-merge fold vs sequential application      #
# ---------------------------------------------------------------- #

def _multi_fold_merge(syms: list[str], merges: list[tuple[str, str]]) -> list[str]:
    """Python mirror of the batched Catalyst fold in
    operators.text._bpe_train_batched: ONE pass, first matching merge
    arm wins (at most one can match under symbol-disjointness)."""
    if not syms:
        return []
    acc = syms[0]
    for s in syms[1:]:
        for left, right in merges:
            if s == right and (acc == left or acc.endswith(SEP + left)):
                acc += right
                break
        else:
            acc += SEP + s
    return acc.split(SEP)


def _disjoint(merges: list[tuple[str, str]]) -> bool:
    tri = [{l, r, l + r} for l, r in merges]
    return all(
        not (tri[i] & tri[j])
        for i in range(len(tri))
        for j in range(i + 1, len(tri))
    )


@given(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=24),
    st.lists(
        st.tuples(st.sampled_from("abcdef"), st.sampled_from("abcdef")),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@settings(max_examples=400, deadline=None)
def test_batched_fold_equals_sequential_when_disjoint(syms, merges):
    """For SYMBOL-DISJOINT merge batches, applying all merges in one
    fold pass equals applying them one at a time in any order (each
    via the proven single-merge greedy scan) -- the exactness claim
    _bpe_train_batched's rewrite rests on."""
    if not _disjoint(merges):
        return  # the trainer's selection filter guarantees disjointness
    got = _multi_fold_merge(syms, merges)
    seq = list(syms)
    for left, right in merges:
        seq = _scan_merge(seq, left, right)
    assert got == seq
    # order-independence: disjoint merges commute
    seq_rev = list(syms)
    for left, right in reversed(merges):
        seq_rev = _scan_merge(seq_rev, left, right)
    assert got == seq_rev

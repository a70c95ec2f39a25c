"""Invariants of the repo tools that feed graded artifacts (no Spark
session needed; the heavyweight tools are exercised by their own
committed outputs)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_make_sf1_perturbation_preserves_dup_classes():
    """Identical texts must transform identically within a copy
    (intra-copy duplicate classes preserved), copy 0 must pass
    through unchanged, and different copies must diverge."""
    from make_sf1 import _perturb_texts

    t = "the quick brown fox jumps over the lazy dog " * 4
    same0 = _perturb_texts([t, t], 0)
    assert same0 == [t, t]
    c1 = _perturb_texts([t, t, None], 1)
    assert c1[0] == c1[1] != t
    assert c1[2] is None
    c2 = _perturb_texts([t], 2)
    assert c2[0] != c1[0]
    # replacement is positional: token count is invariant
    assert len(c1[0].split(" ")) == len(t.split(" "))


def test_make_sf1_perturbation_pushes_jaccard_below_threshold():
    """The documented property the probe depends on: cross-copy
    trigram-set Jaccard must land well under the 0.65 near-dup
    threshold, else pair ops would measure artificial twin
    inflation at sf1."""
    from de_realtime_voting_spark.constants import NGRAM_JACCARD_THRESHOLD
    from make_sf1 import _perturb_texts

    t = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november oscar papa quebec romeo ") * 3

    def trigrams(s):
        return {s[i:i + 3] for i in range(len(s) - 2)}

    for copy in (1, 5, 9):
        p = _perturb_texts([t], copy)[0]
        a, b = trigrams(t), trigrams(p)
        j = len(a & b) / len(a | b)
        assert j < NGRAM_JACCARD_THRESHOLD, (copy, j)


def test_explain_audit_dedupes_cached_subtrees():
    """plan_text-style dedup: a repeated InMemoryRelation header (same
    modulo exprIds) must have its block counted once."""
    from explain_audit import audit

    plan = """AdaptiveSparkPlan
+- HashAggregate
   +- Exchange hashpartitioning(a#10, 32)
      +- InMemoryTableScan [a#10]
         +- InMemoryRelation [a#10, b#11], StorageLevel(disk)
            +- Exchange hashpartitioning(x#1, 32)
               +- FileScan parquet [x#1,y#2]
   +- InMemoryTableScan [a#99]
      +- InMemoryRelation [a#99, b#100], StorageLevel(disk)
         +- Exchange hashpartitioning(x#1, 32)
            +- FileScan parquet [x#1,y#2]
"""
    # fake df with the raw string: call the line-dedup logic directly
    import re

    from explain_audit import plan_text  # noqa: F401  (import check)

    # replicate plan_text's core on a raw string
    out, seen, skip = [], set(), None
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*(")
        indent = len(line) - len(stripped)
        if skip is not None:
            if indent > skip:
                continue
            skip = None
        if stripped.startswith("InMemoryRelation"):
            key = re.sub(r"#\d+", "#", stripped)
            if key in seen:
                skip = indent
                continue
            seen.add(key)
        out.append(line)
    a = audit("\n".join(out))
    assert a["scans"] == 1
    assert a["exchanges"] == 2  # one outer + one inside the cached plan

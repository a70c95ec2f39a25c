"""Generate an sf1 probe dataset (~10x sf0.1) for the scale probe.

The driver ships sf0.001/0.01/0.1 only; at those sizes most heavy
ops are overhead-bound and the fitted growth exponents prove only
the ABSENCE of blow-ups, not linearity.  This tool builds a 10x
point by replicating sf0.1 ten times with key-domain offsets so
referential integrity holds (custkey/orderkey/partkey/suppkey/
doc_id/vec_id/event_id shift per copy; nation/region stay fixed),
writing to ``.scaledata/sf1`` inside the repo (gitignored -- the
driver's /root/testdata is read-only and must not be touched).

Replication is timing-faithful, not statistics-blind:

* ``documents.text`` gets ~30% of token positions rewritten per copy
  (deterministic in (copy, position)) so cross-copy Jaccard lands
  ~0.54, far under the 0.8 near-dup threshold -- otherwise every doc
  would gain 9 verbatim twins and the pair ops would measure an
  artificial 45x edge inflation no real corpus scale-up produces.
  Intra-copy duplicate classes are preserved exactly (identical
  texts transform identically), so the dup-rate stays proportional.
* ``embeddings.embedding``: copies > 0 get FRESH seeded random
  directions with the ORIGINAL per-vector norms.  Additive noise
  cannot work here: any residual mean-cosine shift inflates the
  above-COSINE_THRESHOLD tail beyond the natural random-pair rate
  (r5 review caught 0.5x noise leaving cosine ~0.85; 15x still
  tripled the above-threshold rate).  Independent directions make
  cross-copy pairs statistically identical to unrelated pairs --
  no artificial twins -- while norm screens and quantization scales
  see the same inputs.
* Everything else (timestamps, values, categorical mixes) replicates
  unchanged: 10x density over the same domains.

Usage:  python tools/make_sf1.py  [out_dir]  [--copies N]

``--copies 100`` builds the sf10 (100x sf0.1) probe point the same
way -- same per-copy determinism, so copies 1..9 of sf10 are
bit-identical to sf1's.  Text perturbation is the only python-loop
stage, so it fans out over a process pool (copy-parallel; results
are deterministic per copy regardless of schedule).
"""

from __future__ import annotations

import hashlib
import os
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
REPLACE_FRAC = 0.3

# key domains: (table, column) pairs sharing one offset constant
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey"),
                ("events", "user_id")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "event_id": [("events", "event_id")],
}
FIXED_TABLES = ("region", "nation")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _perturb_texts(texts: list[str | None], copy: int) -> list[str | None]:
    if copy == 0:
        return texts
    out = []
    for t in texts:
        if t is None:
            out.append(t)
            continue
        toks = t.split(" ")
        # per-text digest mixed into every replacement token: without
        # it all docs of a copy share one 57-token injected vocabulary,
        # inflating cross-document trigram/token overlap (biases block
        # co-occurrence in jaccard-style probes).  Identical texts
        # still transform identically (dup classes preserved).
        h = hashlib.md5(t.encode()).hexdigest()[:4]
        for j in range(len(toks)):
            # deterministic in (copy, position, text-digest)
            if (j * 2654435761 + copy * 40503) % 100 < REPLACE_FRAC * 100:
                toks[j] = f"v{copy}t{j % 57}h{h}"
        out.append(" ".join(toks))
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    copies = COPIES
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
    out_dir = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata", "sf1")
    os.makedirs(out_dir, exist_ok=True)

    tabs = {t: pq.read_table(os.path.join(SRC, f"{t}.parquet")) for t in TABLES}
    offsets = {
        dom: max(int(pc.max(tabs[t][c]).as_py()) for t, c in cols) + 1
        for dom, cols in DOMAINS.items()
    }
    col_offset = {(t, c): offsets[dom] for dom, cols in DOMAINS.items()
                  for t, c in cols}

    # documents.text perturbation is the one python-loop stage; at
    # --copies 100 it dominates wall-clock single-threaded, so fan the
    # per-copy calls (independent, deterministic) over a process pool
    base_texts = tabs["documents"]["text"].to_pylist()
    with ProcessPoolExecutor(max_workers=min(16, os.cpu_count() or 1)) as pool:
        perturbed = dict(
            zip(
                range(1, copies),
                pool.map(_perturb_texts, [base_texts] * (copies - 1),
                         range(1, copies), chunksize=1),
            )
        )
    perturbed[0] = base_texts

    for name, tab in tabs.items():
        if name in FIXED_TABLES:
            pq.write_table(tab, os.path.join(out_dir, f"{name}.parquet"))
            print(f"{name}: {tab.num_rows} rows (fixed dim)")
            continue
        parts = []
        for i in range(copies):
            cols = []
            for field in tab.schema:
                col = tab[field.name]
                off = col_offset.get((name, field.name))
                if off is not None and i > 0:
                    col = pc.add(col, pa.scalar(off * i, type=field.type))
                elif name == "documents" and field.name == "text":
                    col = pa.array(perturbed[i], type=pa.string())
                elif name == "documents" and field.name == "n_chars":
                    # recomputed after text perturbation below
                    col = None
                elif name == "embeddings" and field.name == "embedding" and i > 0:
                    mat = np.array(col.to_pylist(), dtype=np.float32)
                    rng = np.random.RandomState(42 + i)
                    noise = rng.normal(0.0, 1.0, mat.shape).astype(np.float32)
                    norms = np.linalg.norm(mat, axis=1, keepdims=True)
                    nn = np.linalg.norm(noise, axis=1, keepdims=True)
                    # FRESH random directions, norm-matched: any
                    # additive perturbation keeps a mean cosine shift
                    # whose 64-dim tail crosses COSINE_THRESHOLD more
                    # often than unrelated vectors do (measured: 3.0%
                    # vs the 0.7% natural rate at 15x noise; 0.5x left
                    # 0.85 mean cosine).  Independent directions make
                    # the cross-copy above-threshold rate EQUAL the
                    # natural random-pair rate by construction, and
                    # keeping the original norms preserves the outlier
                    # screens' and quantization scales' inputs.
                    mixed = noise * (norms / np.maximum(nn, 1e-9))
                    col = pa.array(mixed.tolist(), type=field.type)
                cols.append(col)
            if name == "documents":
                ti = tab.schema.get_field_index("text")
                ni = tab.schema.get_field_index("n_chars")
                texts = cols[ti].to_pylist()
                cols[ni] = pa.array(
                    [len(t) if t is not None else None for t in texts],
                    type=pa.int64())
            parts.append(pa.table(dict(zip(tab.schema.names, cols)),
                                  schema=tab.schema))
        big = pa.concat_tables(parts)
        pq.write_table(big, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {big.num_rows} rows")


if __name__ == "__main__":
    main()

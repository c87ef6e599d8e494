"""Constant-dup-density corpus generator for the sf1 scaling proof.

Why not just scale the driver fixture up: /root/testdata's documents table
draws every token from a 31-word vocabulary, so at tau=0.8 the number of
true Jaccard pairs grows ~quadratically in corpus size — the OUTPUT is
Theta(N^2) by data construction, and a slope gate over it measures the
fixture, not the plan. A 100 TB web corpus is the opposite regime: vocab
grows with the corpus (Heaps' law) and a document's near-dup degree is
roughly constant (its mirror/template copies), so pair volume is O(N).

This generator reproduces that regime deterministically (fixed seed, no
wall-clock anywhere):

- vocabulary of ``max(2000, n_docs)`` tokens (Heaps-ish growth), sampled
  Zipf-like (p(rank r) ~ 1/(r+30)) — hot head tokens exist (the skew the
  PPJoin prefix filter must survive) but two random docs share only head
  tokens, far below tau=0.8 distinct-Jaccard;
- planted near-dup clusters: each of N/5 base docs emits itself plus 4
  copies with 5% of token positions resampled (distinct-Jaccard ~0.9 >
  tau), same lang per cluster (the pair frames join within lang) — so
  every doc has ~4 true partners at ANY corpus size: pair output is O(N)
  and a measured super-linear runtime slope is the PLAN's fault.

Schema matches /root/testdata documents.parquet exactly:
(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_LANGS = ["en", "en", "de", "es", "fr", "zh"]  # en ~2x, like the fixture
_N_SOURCES = 20
_CLUSTER = 5  # 1 base + 4 perturbed copies
_PERTURB = 0.05  # per-position resample probability in a copy
_SEED = 7


def generate(out_dir: str, n_docs: int, seed: int = _SEED) -> str:
    """Write ``documents.parquet`` with ``~n_docs`` rows (rounded down to
    a multiple of the cluster size) under ``out_dir``; returns ``out_dir``.
    Idempotent: an existing non-empty file is left untouched."""
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_base = n_docs // _CLUSTER
    vocab_n = max(2000, n_docs)
    ranks = np.arange(vocab_n, dtype=np.float64)
    probs = 1.0 / (ranks + 30.0)
    probs /= probs.sum()

    doc_ids, texts, langs, sources = [], [], [], []
    next_id = 0
    for b in range(n_base):
        length = int(rng.integers(20, 81))
        base = rng.choice(vocab_n, size=length, p=probs)
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        members = [base]
        for _ in range(_CLUSTER - 1):
            copy = base.copy()
            flip = rng.random(length) < _PERTURB
            if flip.any():
                copy[flip] = rng.choice(vocab_n, size=int(flip.sum()), p=probs)
            members.append(copy)
        for m in members:
            doc_ids.append(next_id)
            texts.append(" ".join(f"w{t}" for t in m))
            langs.append(lang)
            sources.append(f"src{next_id % _N_SOURCES}")
            next_id += 1

    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    return out_dir


if __name__ == "__main__":
    import sys

    generate(sys.argv[1], int(sys.argv[2]))

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
        # still top up the embeddings table (added round 11) if an older
        # fixture dir predates it — both writers are individually idempotent
        generate_embeddings(out_dir, 2 * n_docs // 5, seed=seed)
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_base = n_docs // _CLUSTER
    vocab_n = max(2000, n_docs)
    ranks = np.arange(vocab_n, dtype=np.float64)
    probs = 1.0 / (ranks + 30.0)
    probs /= probs.sum()
    # Inverse-CDF sampling via searchsorted: rng.choice(p=probs) rebuilds
    # its O(vocab) lookup PER CALL, which made the sf1-class corpus
    # (100k clusters x 500k vocab) take hours; the cumulative table makes
    # each draw O(log vocab). Same Zipf-ish marginal distribution — the
    # decade gates measure slopes, not token identities.
    cum = np.cumsum(probs)

    def _draw(size: int) -> np.ndarray:
        return np.searchsorted(cum, rng.random(size), side="right")

    doc_ids, texts, langs, sources = [], [], [], []
    next_id = 0
    for b in range(n_base):
        length = int(rng.integers(20, 81))
        base = _draw(length)
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        members = [base]
        for _ in range(_CLUSTER - 1):
            copy = base.copy()
            flip = rng.random(length) < _PERTURB
            if flip.any():
                copy[flip] = _draw(int(flip.sum()))
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
    generate_embeddings(out_dir, 2 * n_docs // 5, seed=seed)
    return out_dir


_EMB_DIM = 64
_EMB_CLUSTER = 25  # 1 base + 24 noisy copies per semantic cluster
_EMB_NOISE = 0.005  # per-dim Gaussian noise sigma in each cluster copy


def _spread_supports() -> list[list[int]]:
    """72 supports of 8 dims each from the GF(64) subspace spread, pairwise
    intersecting in <= 1 dim.

    Identify dims 0..63 with GF(2^6) under the primitive polynomial
    x^6 + x + 1. GF(8) embeds as the order-7 subgroup {g^(9j)} ∪ {0} — a
    1-dim GF(8)-subspace, i.e. a 3-dim F2-subspace (8 elements). Its 9
    multiplicative translates g^i·GF(8), i = 0..8, pairwise intersect in
    {0} only (a classic spread of PG(5,2) by planes); the 8 additive
    cosets of each then give 9·8 = 72 supports where two supports from the
    same subspace are disjoint and from different subspaces share at most
    |coset ∩ coset| <= |U ∩ V| = 1 element."""
    # discrete exp table for GF(64), primitive poly x^6 + x + 1 (0b1000011)
    exp = [0] * 63
    v = 1
    for i in range(63):
        exp[i] = v
        v <<= 1
        if v & 64:
            v ^= 0b1000011
    subspaces = []
    for i in range(9):
        sub = {0} | {exp[(i + 9 * j) % 63] for j in range(7)}
        subspaces.append(sorted(sub))
    supports = []
    for sub in subspaces:
        elems = set(sub)
        seen: set[int] = set()
        for rep in range(64):
            if rep in seen:
                continue
            coset = sorted(rep ^ e for e in sub)
            seen.update(coset)
            supports.append(coset)
        assert len(seen) == 64
    return supports


def _walsh8() -> np.ndarray:
    h = np.array([[1.0]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    return h  # 8x8, rows mutually orthogonal, entries ±1


def generate_embeddings(out_dir: str, n_vecs: int, seed: int = _SEED) -> str:
    """Write ``embeddings.parquet`` with ``~n_vecs`` rows (rounded down to
    a multiple of the cluster size) — the constant-dup-density regime for
    the SEMANTIC pair family (C125), mirroring what the documents table
    does for the token families.

    Random directions cannot work here: with tau = 0.3 in 64 dims, any
    i.i.d. direction family has a CONSTANT per-pair probability of
    crossing tau (measured: a sparse-Gaussian attempt produced 42k
    qualifying pairs at 2k vectors and 3.9M at 20k — Θ(N²) output, the
    exact regime the decade gate must exclude). So base directions are
    STRUCTURALLY near-orthogonal:

    - supports: the 72 GF(64)-spread cosets (:func:`_spread_supports`),
      8 dims each, pairwise sharing <= 1 dim;
    - per support, 16 sign patterns (8 Walsh rows and their negations),
      equal magnitudes 1/sqrt(8) — within a support cosines are 0 or -1,
      across supports |cos| <= 1/8 = 0.125, ALL below tau with a 16-sigma
      noise margin (the SemDeDup cut also requires dot > 0, so the -1
      antipodal pairs never qualify). 72·16 = 1152 distinct directions;
    - each direction used emits 1 base + {_EMB_CLUSTER - 1} noisy copies
      (sigma {_EMB_NOISE}/dim, re-normalized → in-cluster quantized
      cosine ~0.96 >> tau): every vector has {_EMB_CLUSTER - 1} true
      semantic partners at ANY corpus size — pair output is O(N);
    - ids are STRIDED across clusters (member m of base b gets vec_id
      m*n_base + b), so the deterministic "first k vec_ids" seeding
      convention (C33/C77) sees k DISTINCT directions — seed diversity is
      a property of a real shuffled corpus, not something the fixture
      should accidentally destroy with cluster-consecutive ids.

    Schema matches /root/testdata embeddings.parquet exactly:
    (vec_id BIGINT, embedding FLOAT[], label INT). Idempotent like
    :func:`generate`."""
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # The spread construction provides exactly 72 x 16 = 1152 directions
    # with pairwise |cos| <= 0.125 — the price of PROVABLY-O(N) pair
    # output (any larger i.i.d. family's extreme-value tail crosses
    # tau=0.3). Corpora asking for more vectors are capped at the family
    # limit: the semantic decade runs at its largest clean 10x
    # (2,880 -> 28,800 vectors) rather than on a fixture whose output
    # volume would no longer be O(N).
    n_base = min(n_vecs // _EMB_CLUSTER, 16 * 72)
    supports = _spread_supports()
    walsh = _walsh8() / np.sqrt(8.0)
    assert n_base <= 16 * len(supports), n_base
    base = np.zeros((n_base, _EMB_DIM), dtype=np.float64)
    # direction order interleaves subspaces first (supports are emitted
    # coset-major per subspace; stride 9 walks one coset of each subspace
    # before repeating), keeping ANY prefix of directions seed-diverse.
    for b in range(n_base):
        pattern, sidx = divmod(b, len(supports))
        # supports is subspace-major (subspace*8 + coset); walk subspaces
        # round-robin so any id prefix spans distinct subspaces
        sup = supports[(sidx % 9) * 8 + (sidx // 9)]
        sign = -1.0 if pattern >= 8 else 1.0
        base[b, sup] = sign * walsh[pattern % 8]

    rng = np.random.default_rng(seed + 1)
    vec_ids, embs, labels = [], [], []
    for member in range(_EMB_CLUSTER):
        if member == 0:
            mat = base
        else:
            mat = base + rng.normal(0.0, _EMB_NOISE, base.shape)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for b in range(n_base):
            vec_ids.append(member * n_base + b)
            embs.append(mat[b].astype(np.float32))
            labels.append(b % 16)
    tbl = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in embs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, path)
    return out_dir


if __name__ == "__main__":
    import sys

    generate(sys.argv[1], int(sys.argv[2]))

"""Linear-chain CRF tagger — the reference parser's second model type.

The reference address parser runs either the greedy averaged perceptron
(core/perceptron.py) or a linear-chain CRF decoded with Viterbi:
/root/reference/src/crf.c:100-130 (crf_tagger_predict →
crf_context_viterbi), /root/reference/src/crf_context.c:567-660 (the
Viterbi loop: V[0,j] = state[0,j]; V[t,j] = max_i(V[t-1,i] + trans[i,j])
+ state[t,j]; strict `<` comparisons, so ties go to the SMALLEST index
— np.argmax's first-max rule), trained by structured-perceptron updates
/root/reference/src/crf_trainer_averaged_perceptron.c:438-595 (Viterbi-
decode each sequence with the current weights; where guess[t] ≠ truth[t]
update the state features ±1; where the (prev, cur) tag bigram differs
update the dense transition matrix ±1; weights averaged lazily).

Deliberate deviations, documented:

* INTEGER-EXACT averaged weights, as in core/perceptron.py: updates are
  ±1 and the classic 1/T average is kept as the unscaled int64
  accumulator (argmax-invariant), so Viterbi scores are pure integer
  sums — bit-reproducible on any host and replayable in SQL (the
  address_parse_crf oracle unrolls this exact recurrence).
* The averaging clock ticks once per TOKEN, not once per erroneous
  token as the reference's `num_updates` does
  (crf_trainer_averaged_perceptron.c:529). The reference trains on
  millions of noisy OSM sequences where errors never stop, so its
  error-clock keeps advancing; on a small separable corpus the error
  clock freezes at convergence and the average stays dominated by the
  early mistake-era weights (measured: 599/900 training errors with the
  error clock vs 0/900 with the token clock, same updates). The token
  clock is the standard Collins formulation and matches
  core/perceptron.fit.
* The reference's observation-conditioned transition features
  (state_trans, crf.h:33) are folded into the richer observation
  features + the dense transition matrix; this corpus needs no more.

Training is a pure function of its inputs (fixed iteration order, no
randomness) — two fits anywhere produce identical weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

# feature_fn(tokens, i) -> active OBSERVATION feature keys (no tag
# history — transitions carry that in a CRF)
ObsFeatureFn = Callable[[Sequence[str], int], list[str]]


@dataclass
class CRFModel:
    tags: list[str]                    # index == tag id (tid)
    state: dict[str, np.ndarray]       # feature -> int64[len(tags)]
    trans: np.ndarray                  # int64[len(tags), len(tags)]

    def export_state_rows(self) -> list[tuple[str, int, int]]:
        out = []
        for f, arr in self.state.items():
            for tid in np.nonzero(arr)[0]:
                out.append((f, int(tid), int(arr[tid])))
        out.sort()
        return out

    def export_trans_rows(self) -> list[tuple[int, int, int]]:
        out = []
        for i, j in zip(*np.nonzero(self.trans)):
            out.append((int(i), int(j), int(self.trans[i, j])))
        out.sort()
        return out


def _state_matrix(
    tokens: Sequence[str], state: dict[str, np.ndarray], n_tags: int,
    feature_fn: ObsFeatureFn, feats: list[list[str]] | None = None,
) -> np.ndarray:
    S = np.zeros((len(tokens), n_tags), dtype=np.int64)
    for t in range(len(tokens)):
        for f in feats[t] if feats is not None else feature_fn(tokens, t):
            row = state.get(f)
            if row is not None:
                S[t] += row
    return S


def viterbi_ids(
    tokens: Sequence[str], state: dict[str, np.ndarray],
    trans: np.ndarray, n_tags: int, feature_fn: ObsFeatureFn,
    feats: list[list[str]] | None = None,
) -> list[int]:
    """The crf_context_viterbi recurrence over int64 scores.  np.argmax
    picks the first maximum == the reference's strict `<` loops.
    ``feats`` (optional) supplies precomputed per-token observation feature
    lists — identical to calling ``feature_fn`` per token, just cheaper for
    the trainer, whose features never change across iterations."""
    S = _state_matrix(tokens, state, n_tags, feature_fn, feats)
    n = len(tokens)
    V = S[0].copy()
    back = np.zeros((n, n_tags), dtype=np.int64)
    for t in range(1, n):
        cand = V[:, None] + trans
        bp = np.argmax(cand, axis=0)
        back[t] = bp
        V = cand[bp, np.arange(n_tags)] + S[t]
    j = int(np.argmax(V))
    path = [j]
    for t in range(n - 1, 0, -1):
        j = int(back[t, j])
        path.append(j)
    return list(reversed(path))


def decode(
    tokens: Sequence[str], model: CRFModel, feature_fn: ObsFeatureFn
) -> list[str]:
    ids = viterbi_ids(
        list(tokens), model.state, model.trans, len(model.tags), feature_fn)
    return [model.tags[i] for i in ids]


def fit(
    examples: Sequence[tuple[Sequence[str], Sequence[str]]],
    tags: Sequence[str],
    feature_fn: ObsFeatureFn,
    iters: int = 10,
) -> CRFModel:
    """Structured-perceptron CRF fit (Viterbi decode inside the loop —
    the crf_trainer_averaged_perceptron.c scheme with the token-clock
    averaging deviation documented above)."""
    tags = list(tags)
    n_tags = len(tags)
    tid = {t: j for j, t in enumerate(tags)}
    state: dict[str, np.ndarray] = {}
    acc: dict[str, np.ndarray] = {}
    last: dict[str, int] = {}
    trans = np.zeros((n_tags, n_tags), dtype=np.int64)
    tacc = np.zeros((n_tags, n_tags), dtype=np.int64)
    tlast = np.zeros((n_tags, n_tags), dtype=np.int64)
    u = 0

    def _tick(f: str) -> np.ndarray:
        row = state.get(f)
        if row is None:
            row = np.zeros(n_tags, dtype=np.int64)
            state[f] = row
            acc[f] = np.zeros(n_tags, dtype=np.int64)
            last[f] = u
            return row
        acc[f] += row * (u - last[f])
        last[f] = u
        return row

    def _ttick(i: int, j: int) -> None:
        tacc[i, j] += trans[i, j] * (u - tlast[i, j])
        tlast[i, j] = u

    # observation features are history-free (ObsFeatureFn), so each
    # example's per-token feature lists are loop invariants — compute once
    # instead of once per iteration (and once more per erroneous token)
    feats_all = [
        [feature_fn(tokens, t) for t in range(len(tokens))]
        for tokens, _ in examples
    ]
    golds = [[tid[x] for x in labels] for _, labels in examples]
    # decode-skip bookkeeping (same scheme as core/perceptron.fit): a clean
    # Viterbi decode against unchanged (state, trans) would repeat verbatim,
    # so skip it and advance the token clock only — weights bit-identical.
    version = 0
    ex_seen: list[tuple[int, bool]] = [(-1, False)] * len(examples)

    for _ in range(iters):
        for ei, (tokens, labels) in enumerate(examples):
            seen_v, clean = ex_seen[ei]
            if clean and seen_v == version:
                u += len(tokens)
                continue
            gold = golds[ei]
            fx = feats_all[ei]
            g = viterbi_ids(tokens, state, trans, n_tags, feature_fn, fx)
            had_err = g != gold
            for t in range(len(tokens)):
                u += 1
                if g[t] != gold[t]:
                    version += 1
                    for f in fx[t]:
                        row = _tick(f)
                        row[gold[t]] += 1
                        row[g[t]] -= 1
                if t > 0 and (g[t - 1], g[t]) != (gold[t - 1], gold[t]):
                    # the reference's trans update rule
                    # (crf_trainer_averaged_perceptron.c:583-588)
                    version += 1
                    _ttick(gold[t - 1], gold[t])
                    trans[gold[t - 1], gold[t]] += 1
                    _ttick(g[t - 1], g[t])
                    trans[g[t - 1], g[t]] -= 1
            ex_seen[ei] = (version, not had_err)

    for f, row in state.items():
        acc[f] += row * (u - last[f])
    tacc += trans * (u - tlast)
    return CRFModel(
        tags,
        {f: a for f, a in acc.items() if np.any(a)},
        tacc,
    )

"""Averaged structured perceptron — the reference address parser's model.

The reference tags address tokens with a greedy left-to-right averaged
perceptron keeping TWO tags of history (prev, prev2):
/root/reference/src/averaged_perceptron.c (sparse string-keyed weights,
argmax over classes), /root/reference/src/averaged_perceptron_tagger.c:16-68
(the decode loop: predict token i with features conditioned on the
predicted tags at i-1 and i-2), trained by
/root/reference/src/averaged_perceptron_trainer.c (update +1 on the true
class / -1 on the guessed class for every active feature, weights averaged
over all update timesteps).

This module is that model re-expressed for the Spark engine with one
deliberate twist — INTEGER-EXACT averaged weights:

* raw weights are int64 (updates are ±1);
* the classic average  w̄_f = (Σ_t w_f(t)) / T  is kept UNSCALED as the
  integer accumulator  acc_f = Σ_t w_f(t)  (computed with the standard
  lazy timestamp trick).  Prediction is an argmax of scores LINEAR in the
  weights, so dropping the positive constant 1/T changes nothing — and an
  all-integer score is bit-reproducible on any host AND replayable in
  pure SQL (the lang_id_logreg playbook, functions/logreg.py);
* ties break toward the SMALLEST tag index (np.argmax's first-max rule ==
  the twin's ``ORDER BY score DESC, tid ASC`` rule).

Training is a pure function of its (examples, feature_fn, tags) inputs —
fixed iteration order, no randomness — so two fits anywhere produce
identical weights (pytest-asserted).  The reference likewise trains its
parser offline single-node (src/address_parser_train.c); at engine scale
only PREDICTION is distributed (one Arrow-batched pass, broadcast
weights — operators/parser.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

# feature_fn(tokens, i, prev_tag, prev2_tag) -> list of active feature keys
FeatureFn = Callable[[Sequence[str], int, str | None, str | None], list[str]]


@dataclass
class PerceptronModel:
    tags: list[str]                      # index == tag id (tid)
    weights: dict[str, np.ndarray]       # feature -> int64[len(tags)]

    def export_rows(self) -> list[tuple[str, int, int]]:
        """Nonzero (feature, tid, weight) rows — the SQL-twin VALUES table
        and the Spark broadcast payload."""
        out = []
        for f, arr in self.weights.items():
            for tid in np.nonzero(arr)[0]:
                out.append((f, int(tid), int(arr[tid])))
        out.sort()
        return out


def _score_argmax(
    weights: dict[str, np.ndarray], feats: list[str], n_tags: int
) -> int:
    s = np.zeros(n_tags, dtype=np.int64)
    for f in feats:
        row = weights.get(f)
        if row is not None:
            s += row
    return int(np.argmax(s))            # first max == smallest tid on ties


def decode(
    tokens: Sequence[str],
    weights: dict[str, np.ndarray],
    tags: Sequence[str],
    feature_fn: FeatureFn,
) -> list[str]:
    """Greedy left-to-right decode with predicted prev/prev2 history —
    the averaged_perceptron_tagger.c loop."""
    n_tags = len(tags)
    out: list[str] = []
    prev: str | None = None
    prev2: str | None = None
    for i in range(len(tokens)):
        feats = feature_fn(tokens, i, prev, prev2)
        g = _score_argmax(weights, feats, n_tags)
        out.append(tags[g])
        prev2, prev = prev, tags[g]
    return out


def fit(
    examples: Sequence[tuple[Sequence[str], Sequence[str]]],
    tags: Sequence[str],
    feature_fn: FeatureFn,
    iters: int = 5,
) -> PerceptronModel:
    """Averaged-perceptron fit over (tokens, labels) sequences.

    Decoding during training uses the PREDICTED history (the reference
    trainer's behavior — mistakes propagate into the prev-tag features of
    the next token, which is what makes the learned transition weights
    robust to its own decode errors).  The timestep t advances once per
    TOKEN; averaging uses the lazy (t - last_touched) trick with integer
    accumulators throughout.
    """
    tags = list(tags)
    n_tags = len(tags)
    tid = {t: j for j, t in enumerate(tags)}
    w: dict[str, np.ndarray] = {}
    acc: dict[str, np.ndarray] = {}
    last: dict[str, int] = {}
    t = 0

    def _tick(f: str) -> np.ndarray:
        row = w.get(f)
        if row is None:
            row = np.zeros(n_tags, dtype=np.int64)
            w[f] = row
            acc[f] = np.zeros(n_tags, dtype=np.int64)
            last[f] = t
            return row
        acc[f] += row * (t - last[f])
        last[f] = t
        return row

    # decode-skip bookkeeping: an example decoded ERROR-FREE against weights
    # that have not changed since (version = count of update events) would
    # decode identically now — skipping the decode changes nothing except
    # advancing the token clock, which a clean pass does anyway (updates are
    # the only reader of t via the lazy _tick). After convergence (this
    # corpus reaches 0 training errors by iter ~5 of 10) whole iterations
    # become O(1), and weights are bit-identical either way (pytest-pinned).
    version = 0
    ex_seen: list[tuple[int, bool]] = [(-1, False)] * len(examples)

    for _ in range(iters):
        for ei, (tokens, labels) in enumerate(examples):
            seen_v, clean = ex_seen[ei]
            if clean and seen_v == version:
                t += len(tokens)
                continue
            had_err = False
            prev: str | None = None
            prev2: str | None = None
            for i in range(len(tokens)):
                t += 1
                feats = feature_fn(tokens, i, prev, prev2)
                g = _score_argmax(w, feats, n_tags)
                y = tid[labels[i]]
                if g != y:
                    had_err = True
                    version += 1
                    for f in feats:
                        row = _tick(f)
                        row[y] += 1
                        row[g] -= 1
                prev2, prev = prev, tags[g]
            ex_seen[ei] = (version, not had_err)

    for f, row in w.items():
        acc[f] += row * (t - last[f])
    weights = {f: a for f, a in acc.items() if np.any(a)}
    return PerceptronModel(tags, weights)

"""The prediction cascade: exact → Jaccard top-n → fuzzy Levenshtein → model.

Reference parity: predict.py:17-321.  Stage semantics:

1. **Exact** (predict.py:97-113): transformed-title hash lookup (on duplicate
   truth titles the last title_id wins, as with the reference's dict
   reversal, predict.py:75), prediction = 1.0.
2. **Fuzzy** (predict.py:140-183): for each remaining query, its top-100
   weighted-Jaccard candidates are filtered by the length-delta "deletion
   ratio" (≥ threshold), scored with the rounded Levenshtein ratio, falling
   back to the token-sort ratio when ≤ threshold; matches with ratio >
   threshold are grouped per query, max taken, and queries with tied
   distinct max rows are dropped to the next stage.
3. **Model** (predict.py:185-254): all 100 candidates of still-unmatched
   queries are scored by the GBT reranker over the 66-dim features;
   per-query argmax kept if prediction > 0.9 (unless single-title mode,
   which returns the argmax unconditionally, predict.py:239-242).

Everything is batched: no 10k-row chunk loop (the reference's chunking,
predict.py:294-314, is a memory workaround with no semantic effect), no
per-row candidate loops.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from doppelspeller_tpu.config import Config, get_config
from doppelspeller_tpu.models.gbt import GBTModel
from doppelspeller_tpu.models.trainer import WordCounts
from doppelspeller_tpu.ops.jaccard import JaccardScorer
from doppelspeller_tpu.ops.ngram_index import TruthIndex, build_truth_index
from doppelspeller_tpu.utils import text as T
from doppelspeller_tpu.utils.io import TitleSet, load_ground_truth

LOGGER = logging.getLogger(__name__)

STAGE_NONE = 0
STAGE_EXACT = 1
STAGE_FUZZY = 2
STAGE_MODEL = 3


@dataclass
class PredictionResult:
    test_index: np.ndarray        # int64[N]
    match_title_id: np.ndarray    # int64[N]  (−1 = not found)
    prediction: np.ndarray        # float32[N]
    stage: np.ndarray             # uint8[N]  (STAGE_*)
    transformed: List[str]
    match_transformed: List[Optional[str]]
    stage_counts: Dict[str, int] = field(default_factory=dict)
    stage_seconds: Dict[str, float] = field(default_factory=dict)

    def to_output_frame(self):
        import pandas as pd

        return pd.DataFrame(
            {"title_id": self.match_title_id, "test_index": self.test_index}
        ).sort_values("test_index")

    def save_csv(self, path: str, delimiter: str = "|") -> None:
        self.to_output_frame().to_csv(path, index=False, sep=delimiter)

    def single_result(self) -> dict:
        """Reference single-title dict (predict.py:35-41,316-317)."""
        return {
            "test_index": int(self.test_index[0]),
            "transformed_title": self.transformed[0],
            "match_transformed_title": self.match_transformed[0],
            "match_title_id": int(self.match_title_id[0]),
            "prediction": float(self.prediction[0]),
        }


def _length_probe(cand_d, t_len_d, t_wlen_max_d):
    """Per-row max candidate (length, word length) — ONE tiny device call so
    the host can pick exact static buckets for the device cascade without
    fetching the (R, K) candidate matrix."""
    import jax

    @jax.jit
    def probe(cand, t_len, t_wlen_max):
        flat = cand.reshape(-1)
        tl = t_len[flat].reshape(cand.shape).max(axis=1)
        wl = t_wlen_max[flat].reshape(cand.shape).max(axis=1)
        return tl, wl

    tl, wl = probe(cand_d, t_len_d, t_wlen_max_d)
    return np.asarray(tl), np.asarray(wl)


def _groupby_max_unique(q_idx: np.ndarray, values: np.ndarray, n_queries: int):
    """For rows (q_idx, value): per-query max and whether it is achieved by
    exactly one row.  Returns (max_val[nq], best_row[nq], unique[nq])."""
    max_val = np.full(n_queries, -np.inf, dtype=np.float64)
    np.maximum.at(max_val, q_idx, values.astype(np.float64))
    is_max = values.astype(np.float64) == max_val[q_idx]
    count_max = np.zeros(n_queries, dtype=np.int64)
    np.add.at(count_max, q_idx[is_max], 1)
    best_row = np.full(n_queries, -1, dtype=np.int64)
    rows = np.flatnonzero(is_max)
    best_row[q_idx[rows][::-1]] = rows[::-1]  # keep FIRST max row
    return max_val, best_row, count_max == 1


class Matcher:
    """End-to-end matcher over a truth database (reference Prediction class)."""

    def __init__(
        self,
        config: Optional[Config] = None,
        truth: Optional[TitleSet] = None,
        index: Optional[TruthIndex] = None,
        model: Optional[GBTModel] = None,
        use_index_checkpoint: bool = True,
        mesh=None,
    ):
        """``mesh``: a 1-D jax.sharding.Mesh — the truth index is sharded over
        the title axis for retrieval (per-shard MXU scoring + ICI all-gather
        merge) and the fuzzy/model stages run data-parallel over the query
        rows.  Multi-chip capability per SURVEY.md §2.4 (the reference is
        single-node; README.md:79-80 frames distribution as future work)."""
        self.cfg = config or get_config()
        self.mesh = mesh
        self.truth = truth or load_ground_truth(self.cfg)
        if index is None and use_index_checkpoint and os.path.exists(self.cfg.index_path):
            # resume from the checkpointed index (cli.py build-index) — the
            # reference rebuilds its MatchMaker from CSV on every run
            from doppelspeller_tpu.ops.ngram_index import title_content_hash

            try:
                loaded = TruthIndex.load(self.cfg.index_path)
            except Exception as exc:  # stale/old-format checkpoint
                LOGGER.warning(
                    "index checkpoint at %s unreadable (%s); rebuilding",
                    self.cfg.index_path, exc,
                )
                loaded = None
            if (
                loaded is not None
                and loaded.num_titles == len(self.truth)
                and np.array_equal(loaded.title_ids, self.truth.ids)
                and loaded.content_hash
                == title_content_hash(self.truth.encoded, self.truth.lengths)
            ):
                LOGGER.info("loaded index checkpoint from %s", self.cfg.index_path)
                index = loaded
            else:
                LOGGER.warning(
                    "index checkpoint at %s does not match the truth data; rebuilding",
                    self.cfg.index_path,
                )
        self.index = index or build_truth_index(self.truth, self.cfg)
        if mesh is not None:
            from doppelspeller_tpu.parallel.sharded import ShardedJaccardScorer

            self.scorer = ShardedJaccardScorer(self.index, mesh, self.cfg)
        else:
            self.scorer = JaccardScorer(self.index, self.cfg)
        self.model = model
        self.word_counts = WordCounts(self.truth)
        # exact-match hash: duplicate transformed titles → last id wins
        self.reverse: Dict[str, int] = {
            t: int(i) for t, i in zip(self.truth.transformed, self.truth.ids)
        }
        # per-truth-title caches, computed once and gathered per pair
        self._counts_matrix: Optional[np.ndarray] = None
        self._truth_words = None          # (start, wlen, n_words)
        self._ts_truth = None             # token-sorted (enc, len)
        self._rerank = None               # fused stage-3 device engine
        self._fuzzy = None                # fused stage-2 device engine

    @property
    def counts_matrix(self) -> np.ndarray:
        if self._counts_matrix is None:
            self._counts_matrix = self.word_counts.matrix(self.truth.transformed)
        return self._counts_matrix

    @property
    def truth_words(self):
        if self._truth_words is None:
            from doppelspeller_tpu.ops.features import split_words_host

            self._truth_words = split_words_host(
                self.truth.encoded, self.truth.lengths
            )
        return self._truth_words

    @property
    def ts_truth(self):
        if self._ts_truth is None:
            ts = [self._token_sort(t) for t in self.truth.transformed]
            enc = T.encode_titles(ts, self.cfg.max_characters)
            lens = np.array([min(len(s), self.cfg.max_characters) for s in ts], np.int32)
            self._ts_truth = (enc, lens)
        return self._ts_truth

    def _load_model(self) -> GBTModel:
        if self.model is None:
            self.model = GBTModel.load(self.cfg.model_path)
        return self.model

    def _fuzzy_engine(self):
        if self._fuzzy is None:
            from doppelspeller_tpu.ops.fuzzy import FuzzyEngine

            ts_enc, ts_len = self.ts_truth
            self._fuzzy = FuzzyEngine(
                self.truth.encoded, self.truth.lengths, ts_enc, ts_len, self.cfg,
                mesh=self.mesh,
            )
        return self._fuzzy

    def _rerank_engine(self):
        if self._rerank is None:
            from doppelspeller_tpu.ops.rerank import RerankEngine

            self._rerank = RerankEngine(
                self.truth.encoded, self.truth.lengths, self.truth_words,
                self.counts_matrix, self._load_model(), len(self.truth), self.cfg,
                mesh=self.mesh,
            )
        return self._rerank

    def _token_sort(self, title: str) -> str:
        return " ".join(sorted(title.split()))

    # ------------------------------------------------------------- stages

    def _stage_exact(self, queries: TitleSet, res: PredictionResult) -> None:
        hits = 0
        for i, t in enumerate(queries.transformed):
            tid = self.reverse.get(t)
            if tid is not None:
                res.match_title_id[i] = tid
                res.prediction[i] = 1.0
                res.stage[i] = STAGE_EXACT
                res.match_transformed[i] = t
                hits += 1
        res.stage_counts["exact"] = hits
        LOGGER.info("Matched %d titles so far (exact)", hits)

    def _stage_fuzzy(
        self, queries: TitleSet, rem: np.ndarray, cand_pos: np.ndarray,
        res: PredictionResult,
    ) -> None:
        cfg = self.cfg
        R, K = cand_pos.shape
        thr = cfg.levenshtein_ratio_threshold
        q_len = queries.lengths[rem].astype(np.int64)
        t_len = self.truth.lengths[cand_pos.reshape(-1)].reshape(R, K).astype(np.int64)

        tot = q_len[:, None] + t_len
        delta = np.abs(q_len[:, None] - t_len)
        del_ratio = (tot - delta) / np.maximum(tot, 1) * 100.0
        consider = del_ratio >= thr                       # predict.py:150

        ratio = np.zeros((R, K), dtype=np.int32)
        rows, cols = np.nonzero(consider)
        if len(rows):
            # token-sorted query encodings for the remaining rows
            ts_q = [self._token_sort(queries.transformed[r]) for r in rem]
            ts_q_enc = T.encode_titles(ts_q, cfg.max_characters)
            ts_q_len = np.array(
                [min(len(s), cfg.max_characters) for s in ts_q], np.int32
            )
            ts_t_enc, ts_t_len = self.ts_truth
            engine = self._fuzzy_engine()
            ratio[rows, cols] = engine.ratios(
                queries.encoded[rem], queries.lengths[rem].astype(np.int32),
                ts_q_enc, ts_q_len,
                rows, cand_pos[rows, cols],
                self.truth.lengths, ts_t_len,
            )

        keep = ratio > thr                                # predict.py:172
        kr, kc = np.nonzero(keep)
        hits = 0
        if len(kr):
            max_val, best_row, unique = _groupby_max_unique(
                kr, ratio[kr, kc].astype(np.float64), R
            )
            # queries with tied max on distinct rows are dropped to stage 3
            for r in np.flatnonzero((best_row >= 0) & unique):
                row_global = best_row[r]
                col = kc[row_global]
                qi = rem[r]
                pos = cand_pos[r, col]
                res.match_title_id[qi] = int(self.index.title_ids[pos])
                res.prediction[qi] = 1.0
                res.stage[qi] = STAGE_FUZZY
                res.match_transformed[qi] = self.truth.transformed[pos]
                hits += 1
        res.stage_counts["fuzzy"] = hits
        LOGGER.info("Matched %d titles so far (fuzzy)", hits)

    def _stage_model(
        self, queries: TitleSet, rem: np.ndarray, cand_pos: np.ndarray,
        res: PredictionResult, single: bool,
    ) -> None:
        cfg = self.cfg
        R, K = cand_pos.shape
        if R == 0:
            res.stage_counts["model"] = 0
            return
        from doppelspeller_tpu.ops.features import remove_spaces_host

        engine = self._rerank_engine()
        flat_pos = cand_pos.reshape(-1).astype(np.int64)
        q_idx = np.repeat(np.arange(R), K)
        q_wo_u, q_wo_len_u = remove_spaces_host(
            queries.encoded[rem], queries.lengths[rem]
        )
        pred = engine.score(
            queries.encoded[rem], queries.lengths[rem].astype(np.int32),
            q_wo_u, q_wo_len_u,
            q_idx, flat_pos,
            self.truth.lengths,
        )

        hits = 0
        if single:
            best = int(np.argmax(pred))
            qi = rem[q_idx[best]]
            pos = flat_pos[best]
            res.match_title_id[qi] = int(self.index.title_ids[pos])
            res.prediction[qi] = float(pred[best])
            res.stage[qi] = STAGE_MODEL
            res.match_transformed[qi] = self.truth.transformed[pos]
            hits = 1
        else:
            max_val, best_row, unique = _groupby_max_unique(q_idx, pred, R)
            for r in np.flatnonzero(best_row >= 0):
                if not unique[r]:
                    continue
                row = best_row[r]
                if pred[row] <= cfg.prediction_probability_threshold:
                    continue
                qi = rem[r]
                pos = flat_pos[row]
                res.match_title_id[qi] = int(self.index.title_ids[pos])
                res.prediction[qi] = float(pred[row])
                res.stage[qi] = STAGE_MODEL
                res.match_transformed[qi] = self.truth.transformed[pos]
                hits += 1
        res.stage_counts["model"] = hits
        LOGGER.info("Matched %d titles (model stage)", hits)

    # ------------------------------------------------- device-cascade stages

    def _t_wlen_max_d(self):
        if getattr(self, "_twlm_d", None) is None:
            import jax
            import jax.numpy as jnp

            _, wlen, _ = self.truth_words
            wlm = wlen.max(axis=1).astype(np.int32)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._twlm_d = jax.device_put(wlm, NamedSharding(self.mesh, P()))
            else:
                self._twlm_d = jnp.asarray(wlm)
        return self._twlm_d

    def _device_cand_matrix(self, queries: TitleSet, rem: np.ndarray, k: int):
        """Retrieval with the (R, k) candidate matrix LEFT ON DEVICE, rows in
        ``rem`` order.  Only the compaction index vector crosses to the device;
        nothing comes back to the host (VERDICT round-1: the host round-trip
        of cand_pos was the cascade's synchronization bottleneck)."""
        import jax.numpy as jnp

        pending, plans = self.scorer.topk_device(queries, k=k, rows=rem)
        parts, sel, off = [], [], 0
        for chunk, vals, pos in pending:
            G, QB, _ = pos.shape
            parts.append(pos.reshape(G * QB, k))
            for s, plan in enumerate(chunk):
                base = off + s * QB
                sel.append(np.arange(base, base + plan.n_valid, dtype=np.int64))
            off += G * QB
        sel = np.concatenate(sel)
        if len(sel) != len(rem):
            raise AssertionError("plan rows do not cover the query subset")
        cand_all = jnp.concatenate(parts, axis=0)
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            sel_d = jax.device_put(sel, NamedSharding(self.mesh, P()))
        else:
            sel_d = jnp.asarray(sel)
        return cand_all[sel_d]

    def _stage_fuzzy_device(
        self, queries: TitleSet, rem: np.ndarray, cand_d, tl_max: np.ndarray,
        res: PredictionResult,
    ) -> None:
        cfg = self.cfg
        R = len(rem)
        engine = self._fuzzy_engine()
        ts_q = [self._token_sort(queries.transformed[r]) for r in rem]
        ts_q_enc = T.encode_titles(ts_q, cfg.max_characters)
        ts_q_len = np.array(
            [min(len(s), cfg.max_characters) for s in ts_q], np.int32
        )
        q_enc = queries.encoded[rem]
        q_len = queries.lengths[rem].astype(np.int32)

        pair_len = np.maximum(q_len, tl_max)
        buckets = [b for b in cfg.length_buckets if b < cfg.max_characters]
        buckets.append(cfg.max_characters)
        bi = np.searchsorted(np.asarray(buckets), pair_len)

        hits = 0
        overflow_rows = []
        results = []
        for i, tl in enumerate(buckets):
            rows_b = np.flatnonzero(bi == i)
            if not len(rows_b):
                continue
            results.append((rows_b, engine.decide(
                q_enc[rows_b], q_len[rows_b],
                ts_q_enc[rows_b], ts_q_len[rows_b],
                cand_d, rows_b, tl,
            )))
        for rows_b, (m, bp, br, ov) in results:
            if ov.any():  # safety net; exact bucketing makes this unreachable
                overflow_rows.append(rows_b[ov])
                m = m & ~ov
            for j in np.flatnonzero(m):
                qi = rem[rows_b[j]]
                pos = int(bp[j])
                res.match_title_id[qi] = int(self.index.title_ids[pos])
                res.prediction[qi] = 1.0
                res.stage[qi] = STAGE_FUZZY
                res.match_transformed[qi] = self.truth.transformed[pos]
                hits += 1
        res.stage_counts["fuzzy"] = hits
        if overflow_rows:
            import jax.numpy as jnp

            ov_rows = np.concatenate(overflow_rows)
            LOGGER.warning("fuzzy device overflow on %d rows; host redo", len(ov_rows))
            cand_sub = np.asarray(cand_d[jnp.asarray(ov_rows)])
            self._stage_fuzzy(queries, rem[ov_rows], cand_sub, res)
            res.stage_counts["fuzzy"] += hits  # _stage_fuzzy overwrote the count
        LOGGER.info("Matched %d titles so far (fuzzy)", res.stage_counts["fuzzy"])

    def _stage_model_device(
        self, queries: TitleSet, rem: np.ndarray, rows2: np.ndarray, cand_d,
        tl_max: np.ndarray, wl_max: np.ndarray, res: PredictionResult,
    ) -> None:
        """rows2: positions within ``rem``/``cand_d`` still unmatched."""
        from doppelspeller_tpu.ops.features import remove_spaces_host

        cfg = self.cfg
        engine = self._rerank_engine()
        gq = rem[rows2]
        q_enc = queries.encoded[gq]
        q_len = queries.lengths[gq].astype(np.int32)
        q_wo, q_wo_len = remove_spaces_host(q_enc, q_len)

        pair_len = np.maximum(q_len, tl_max[rows2])
        buckets = [b for b in cfg.length_buckets if b < cfg.max_characters]
        buckets.append(cfg.max_characters)
        w_buckets = [8, 16, 32, 64, cfg.max_characters]
        tb = np.searchsorted(np.asarray(buckets), pair_len)
        wb = np.searchsorted(np.asarray(w_buckets), np.maximum(wl_max[rows2], 1))

        hits = 0
        results = []
        for ti, TL in enumerate(buckets):
            for wi, WL in enumerate(w_buckets):
                if WL > TL:
                    continue
                sub = np.flatnonzero((tb == ti) & (wb == wi))
                if not len(sub):
                    continue
                results.append((sub, engine.decide(
                    q_enc[sub], q_len[sub], q_wo[sub], q_wo_len[sub],
                    cand_d, rows2[sub], TL, WL,
                )))
        for sub, (m, bp, pred) in results:
            for j in np.flatnonzero(m):
                qi = gq[sub[j]]
                pos = int(bp[j])
                res.match_title_id[qi] = int(self.index.title_ids[pos])
                res.prediction[qi] = float(pred[j])
                res.stage[qi] = STAGE_MODEL
                res.match_transformed[qi] = self.truth.transformed[pos]
                hits += 1
        res.stage_counts["model"] = hits
        LOGGER.info("Matched %d titles (model stage)", hits)

    # -------------------------------------------------------------- entry

    def predict(self, queries: TitleSet, single: bool = False) -> PredictionResult:
        import time as _time

        cfg = self.cfg
        if single and len(queries) != 1:
            raise ValueError("single prediction requires exactly one query")
        n = len(queries)
        res = PredictionResult(
            test_index=queries.ids.copy(),
            match_title_id=np.full(n, cfg.train_not_found_value, dtype=np.int64),
            prediction=np.zeros(n, dtype=np.float32),
            stage=np.zeros(n, dtype=np.uint8),
            transformed=list(queries.transformed),
            match_transformed=[None] * n,
        )

        t0 = _time.time()
        self._stage_exact(queries, res)
        t1 = _time.time()

        rem = np.flatnonzero(res.stage == STAGE_NONE)
        impl = getattr(cfg, "cascade_impl", "auto")
        use_device = not single and len(rem) > 0 and (
            impl == "device" or (impl == "auto" and len(rem) >= 2048)
        )
        t2 = t3 = t4 = t1
        if use_device:
            cand_d = self._device_cand_matrix(queries, rem, cfg.top_n_predicting)
            tl_max, wl_max = _length_probe(
                cand_d, self._fuzzy_engine().t_len, self._t_wlen_max_d()
            )
            t2 = _time.time()
            self._stage_fuzzy_device(queries, rem, cand_d, tl_max, res)
            t3 = _time.time()
            rows2 = np.flatnonzero(res.stage[rem] == STAGE_NONE)
            if len(rows2):
                self._stage_model_device(
                    queries, rem, rows2, cand_d, tl_max, wl_max, res
                )
            t4 = _time.time()
        elif len(rem):
            _, cand_pos = self.scorer.topk(queries, k=cfg.top_n_predicting, rows=rem)
            t2 = _time.time()
            self._stage_fuzzy(queries, rem, cand_pos, res)
            t3 = _time.time()
            still = res.stage[rem] == STAGE_NONE
            rem2 = rem[still]
            if len(rem2) and (not single or res.stage[0] == STAGE_NONE):
                self._stage_model(queries, rem2, cand_pos[still], res, single)
            t4 = _time.time()
        res.stage_seconds = {
            "exact": t1 - t0, "retrieval": t2 - t1,
            "fuzzy": t3 - t2, "model": t4 - t3,
        }
        LOGGER.info(
            "stage timing: exact %.2fs | retrieval %.2fs | fuzzy %.2fs | model %.2fs",
            t1 - t0, t2 - t1, t3 - t2, t4 - t3,
        )

        LOGGER.info(
            "Matched %d/%d titles (exact %d, fuzzy %d, model %d)",
            int((res.stage != STAGE_NONE).sum()), n,
            res.stage_counts.get("exact", 0),
            res.stage_counts.get("fuzzy", 0),
            res.stage_counts.get("model", 0),
        )
        return res


def accuracy_report(actuals_path: str, output_path: str, delimiter: str = "|") -> dict:
    """Scoring harness (reference cli.py:86-132)."""
    import pandas as pd

    actual = pd.read_csv(actuals_path, sep=delimiter).set_index("test_index")
    predictions = pd.read_csv(output_path, sep=delimiter).set_index("test_index")
    actual_map = actual["company_id"].to_dict()
    pred_map = predictions["title_id"].to_dict()

    cm_e = cm_ne = im_e = im_ne = 0
    for key, actual_value in actual_map.items():
        p = pred_map[key]
        if p == -1:
            if actual_value == p:
                cm_ne += 1
            else:
                im_ne += 1
        else:
            if actual_value == p:
                cm_e += 1
            else:
                im_e += 1
    report = {
        "correctly_matched": cm_e,
        "incorrectly_matched": im_e,
        "correctly_not_found": cm_ne,
        "incorrectly_not_found": im_ne,
        "custom_error": im_ne + im_e * 5,
    }
    LOGGER.info(
        "\n\n    Correctly matched titles            %(correctly_matched)d\n"
        "    Incorrectly matched titles          %(incorrectly_matched)d\n"
        "    Correctly marked as not-found       %(correctly_not_found)d\n"
        "    Incorrectly marked as not-found     %(incorrectly_not_found)d\n\n"
        "    Custom Error                        %(custom_error)d\n",
        report,
    )
    return report

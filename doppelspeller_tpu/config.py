"""Configuration for the TPU-native matcher.

Reference knob set: settings.py:1-77.  Rebuilt as a frozen dataclass that is
validated at construction, with the same `PROJECT_DATA_PATH` env-var override
(reference settings.py:8-12) plus TPU-specific blocking/sharding knobs.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field, replace
from typing import Tuple


def _default_data_path() -> str:
    path = os.environ.get("PROJECT_DATA_PATH")
    if not path:
        path = os.path.abspath("./data/")
        warnings.warn(
            f"Environment variable PROJECT_DATA_PATH not set! Using {path} as default!"
        )
    return os.path.abspath(path)


# The post-transform character alphabet.  Index 0 is the pad/fill character
# (reference: R_FILL_CHARACTER '-', settings.py:69-70); transformed titles can
# only contain [a-z0-9 ], so '-' never collides with real text.
ALPHABET = "- abcdefghijklmnopqrstuvwxyz0123456789"
PAD_CODE = 0
SPACE_CODE = 1
# Characters that can actually appear in a transformed title (36 letters/digits
# + space = 37).  The fixed trigram vocabulary is 37**3 — every possible
# 3-gram gets a static integer id, so no host-side vocab dictionary is needed
# and the index layout is identical for every dataset.
N_TEXT_CHARS = 37  # [ a-z0-9] mapped to 0..36 (space=0) for trigram ids
TRIGRAM_VOCAB_SIZE = N_TEXT_CHARS ** 3  # 50653


@dataclass(frozen=True)
class Config:
    # ---- paths / IO (reference settings.py:17-62) ----
    data_path: str = field(default_factory=_default_data_path)
    ground_truth_file: str = "example_truth.csv"
    train_file: str = "example_train.csv"
    test_file: str = "example_test.csv"
    test_with_actuals_file: str = "example_test_with_actuals.csv"
    final_output_file: str = "final_output.csv"
    model_file: str = "model.npz"
    index_file: str = "index.npz"
    delimiter: str = "|"
    # Source-file column names (reference settings.py:20-43)
    truth_id_column: str = "company_id"
    truth_title_column: str = "name"
    train_index_column: str = "train_index"
    test_index_column: str = "test_index"

    # ---- text / n-grams (reference settings.py:14-15,65-72) ----
    n_grams: int = 3
    max_characters: int = 255
    number_of_words_features: int = 15

    # ---- retrieval (reference settings.py:55-59) ----
    top_n_training: int = 10
    top_n_predicting: int = 100

    # ---- thresholds (reference settings.py:75-77) ----
    levenshtein_ratio_threshold: int = 94
    prediction_probability_threshold: float = 0.9
    false_positive_penalty_factor: float = 5.0
    train_not_found_value: int = -1

    # ---- training (reference settings.py:46-49 + train.py:99-112) ----
    evaluation_fraction_generated: float = 0.05
    evaluation_fraction_negative: float = 0.1
    evaluation_fraction_positive: float = 0.05
    gbt_max_depth: int = 5
    gbt_eta: float = 0.1
    gbt_min_child_weight: float = 1.0
    gbt_num_boost_round: int = 1000
    gbt_early_stopping_rounds: int = 50
    gbt_lambda: float = 1.0
    gbt_max_bins: int = 256
    seed: int = 0

    # ---- TPU execution knobs (new; no reference equivalent) ----
    # matmul dtype for jaccard scoring: bfloat16 rides the MXU at full rate
    # with ~0.3% relative score error (top-k recall is unaffected in tests);
    # float32 is bit-faithful to the set-math oracle
    score_dtype: str = "bfloat16"
    # sliding-window DP backend: "auto" → pallas on TPU, xla elsewhere
    window_impl: str = "auto"
    # retrieval scoring backend: "auto" → pallas on TPU, xla elsewhere
    retrieval_impl: str = "auto"
    # fuse top-k pre-selection into the Pallas score kernel: the (QB, ntp)
    # score tile never leaves VMEM; per title tile only per-window
    # (max, argmax) of width tb/16 cross to HBM (~4x less select traffic).
    # Loses only per-window runner-ups — measured at 500k titles
    # (RECALL_AB.json r5, exact path): recall@100 vs exact-f32 0.995 with
    # window select vs 0.995 plain approx_max_k, and the true match of a
    # misspelled query is retained exactly as often as under exact
    # scoring (0.99011 both); additionally gated by the bench oracle
    # anchor every run.  Inside the FOLDED coarse pass the same fused
    # select applies to upper-bound scores before the exact rescore;
    # folded retention is measured separately (see retrieval_mode).
    retrieval_window_select: bool = True
    # two-stage folded retrieval (ops/fold.py): "auto" engages it when the
    # scorer has the truth encodings, the pallas backend is active, and the
    # index has >= folded_min_titles titles; "folded" forces it; "exact"
    # disables.  The coarse pass scores an upper bound over fold_dim
    # df-balanced trigram buckets from a small permanently-resident matrix
    # (no per-block row gather, ~2.3x fewer MACs at fold_dim=512), then the
    # top rescore_depth candidates per query are rescored EXACTLY against
    # the per-title trigram lists — only coarse recall@rescore_depth is
    # approximate.  Measured at 500k titles (RECALL_AB.json, two-hash
    # production config folded_c512_d128_h2): true-match retention
    # 0.99011 — EQUAL to the exact path's own top-100 retention (the
    # single-hash r4 engine read 0.980); top-1 agreement vs exact-f32
    # 0.960 (the exact path's own approx select sits at 0.961);
    # recall@100 vs exact 0.684 — deep-tail top-100 members (low-score
    # ties) are not reproduced, but the cascade consumes only the head.
    # Gated end-to-end by the bench oracle anchor.  rescore_depth=0
    # returns raw coarse top-k.
    retrieval_mode: str = "auto"
    fold_dim: int = 512
    # independent df-balanced fold partitions; the coarse numerator is the
    # elementwise MIN of the per-hash upper bounds (count-min sketch — each
    # is a monotone upper bound, their min is a tighter one, so coarse
    # recall rises at the cost of one extra resident Mc + matmul per hash).
    # Measured at 500k titles (scripts/lab_fold_recall.py): true-match
    # coarse retention@128 0.978 (1 hash) → 0.991 (2 hashes) = parity with
    # exact scoring's 0.990 top-100 retention.  Pallas path only; the XLA
    # fallback runs the first hash.
    fold_hashes: int = 2
    rescore_depth: int = 128
    # approx_max_k per-candidate recall target for the FOLDED coarse
    # select only (0 → inherit topk_recall_target).  The coarse top-k' is
    # a candidate funnel feeding an exact rescore, not a final ranking, so
    # it tolerates a laxer select than the exact path: 0.95 measured
    # retrieval 2.50 s → 1.81 s at 100k×500k with fold_hashes=2
    # (scripts/lab_folded_r5.py h2 vs h2r95) — approx_max_k's cost is
    # strongly recall-target-dependent, and losses concentrate at the k'
    # boundary where candidates are junk-tail anyway (true-match retention
    # gated by RECALL_AB.json + the bench oracle anchor).
    fold_recall_target: float = 0.95
    folded_min_titles: int = 200_000
    # query-block size for the FOLDED path only (0 → query_block).  The
    # exact path keeps QB small because its contraction is the per-block
    # trigram UNION, which grows with QB — but the folded contraction is
    # fixed at fold_dim regardless of QB, so larger folded blocks amortize
    # per-block fixed costs (scan-step overhead, rescore setup, select
    # windows) with no extra MACs.
    fold_query_block: int = 0
    # select-window width W inside the FOLDED coarse pass (0 → the fused
    # selector's default tb//128 = 16 at tb=2048, which is also the MAX:
    # the selector's out-block lane width tb//W must stay >= 128, so W
    # can only be narrowed below the default, which only increases select
    # traffic — measured dead end, keep 0).  The exact path keeps the
    # default W.
    fold_select_window: int = 0
    # index construction: "auto" → on-device build on TPU (ships ~48 MB of
    # encoded titles instead of the ~3.2 GB packed matrix at 500k titles),
    # host numpy/C++ elsewhere; "host" / "device" force a path
    index_build_impl: str = "auto"
    # top-k selection: <1.0 uses TPU-optimized lax.approx_max_k with this
    # per-query recall target (≈7x faster than exact top_k at 500K titles);
    # 1.0 = exact
    topk_recall_target: float = 0.99
    # queries scored per device step (rows of the MXU matmul).  128 keeps
    # full MXU rows while nearly halving the per-block trigram union vs 256
    # (scoring cost is O(union)): measured 19.4k -> 25.4k q/s retrieval-only
    # and 4.6 s -> 3.3 s in the full bench at 100k x 500k
    query_block: int = 128
    # compact per-query trigram-slot width for the sparse weight transfer:
    # runs whose queries all have <= this many unique trigrams ship
    # (query_block x max_query_trigrams) sparse weights; any longer query
    # switches the whole run to the full width.  No trigrams are dropped.
    max_query_trigrams: int = 64
    # truth titles per inner matmul tile
    title_block: int = 32768
    # static union-size buckets for query-block plans: each block's trigram
    # union is padded to the smallest bucket that holds it (scoring cost is
    # O(union); one compiled program per occupied bucket).  The largest
    # bucket is the planner's hard cap (blocks split above it).
    union_buckets: Tuple[int, ...] = (1024, 1536, 2048, 3072, 4096, 6144, 8192)
    # query blocks scored per device dispatch (lax.scan inside one program —
    # the TPU tunnel costs 10-30 ms RTT per dispatch/fetch).  32 at QB=128
    # keeps 4096 queries per dispatch; 64 measured worse (group padding)
    dispatch_blocks: int = 32
    # union rows unpacked per inner fori step of the pallas scorer (the
    # kernel rounds down to the largest divisor of the block's union size;
    # single-chunk measured ~20% faster than half-chunks at U=2048)
    pallas_union_chunk: int = 2048
    # batched pair block for levenshtein/feature kernels
    pair_block: int = 8192
    # fixed rerank dispatch size (rows per stage-3 slab; padded, so every
    # slab reuses one compiled program per (length, word-length) bucket)
    model_slab: int = 2048
    # adaptive candidate depth for the model stage: wave A scores only the
    # top model_depth_initial jaccard candidates per row; rows whose best
    # wave-A probability >= model_widen_threshold are re-decided over all
    # top_n_predicting candidates (wave B).  Rows below the threshold are
    # final-unmatched without scoring the tail — on jaccard-sorted
    # candidates the argmax virtually always sits in the head (parity
    # gated by tests + the bench oracle anchor).  0 disables (always
    # score every candidate, the reference-shaped behavior).
    model_depth_initial: int = 32
    model_widen_threshold: float = 0.3
    # rows whose wave-A best probability is >= this are decided from the
    # head alone (no wave B): on jaccard-sorted candidates the head argmax
    # is essentially always the global argmax, and the tail could only
    # overturn it with a candidate scoring >= the trusted max.  Measured on
    # the full reference example set (10k queries, 537-tree model): 0/10000
    # final matches differ between 0.995 and never-trusting.  On the
    # synthetic bench world (500k x 100k, 60-tree model, head-max p50 0.993)
    # trusting IS lossy but the threshold curve is flat and the trade bad
    # in both directions (scripts/sweep_trust.py, r5): full-depth 4.76 s
    # end-to-end / accuracy 0.82049; t=0.995 4.22 s / 0.82001 (140 output
    # diffs); t=0.99 4.17 s / 0.81992; t=0.98 4.14 s / 0.81985 — each
    # further 0.05 s costs ~1 bp of accuracy, while never-trusting buys
    # +0.05 % accuracy for +0.54 s (13 %).  0.995 is the knee; the bench
    # oracle anchor additionally gates accuracy every run.  2.0 disables
    # trusting (every widened row scores its full tail)
    model_trust_threshold: float = 0.995
    # cap (in chars) on the fuzzy stage's device DP tile.  The Levenshtein
    # tile costs O(TL²) per pair, so a run dominated by short queries can cap
    # the tile and let the rare long rows overflow to an exact host redo
    # (pipeline host-redo path): a device row is flagged ``over`` whenever a
    # length-prefilter-considered pair has any string longer than the tile.
    # 0 = uncapped (the tile is derived from the threshold so overflow is
    # impossible).  The cap is rounded down to a length bucket.
    fuzzy_tile_cap: int = 0
    # rows per rerank scan step (cap; the per-(tl,wl,k) VMEM/HBM budget may
    # choose less).  Each step costs ~5 ms of fixed launch overhead on a
    # tunnel-attached chip, so bigger steps amortize; HBM temporaries are
    # ~25 KB/pair
    rerank_chunk_cap: int = 512
    # length buckets for DP kernels
    length_buckets: Tuple[int, ...] = (32, 64, 128, 256)
    # mesh axis name used by the sharded index
    mesh_axis: str = "titles"
    # cascade execution: "device" keeps the candidate matrix in HBM and runs
    # fuzzy/model decisions on device (one program per stage); "host" fetches
    # candidates and assembles pairs on the host (reference-shaped path);
    # "auto" picks device for large batches
    cascade_impl: str = "auto"
    # one-dispatch small-batch cascade (ops/serve_fused.py): "auto" fuses
    # retrieval -> fuzzy -> model into ONE device program (one fetch) for
    # requests of <= one retrieval query block on a single chip — the
    # serving hot path; "off" keeps the classic staged path for every size.
    # Rows whose candidates exceed the compiled >=99.9%-coverage rerank
    # bucket are re-decided exactly by the classic host stages.
    serve_fused: str = "auto"

    def __post_init__(self):
        if self.top_n_training > self.top_n_predicting:
            raise ValueError(
                "top_n_training cannot be greater than top_n_predicting "
                "(reference settings.py:58-59)"
            )
        if self.n_grams != 3:
            raise ValueError("only 3-grams are supported (fixed trigram vocab)")
        if self.max_characters > 255:
            raise ValueError("titles are limited to 255 chars (uint8 encoding)")

    # -- derived paths --
    def path(self, name: str) -> str:
        return os.path.join(self.data_path, name)

    @property
    def ground_truth_path(self) -> str:
        return self.path(self.ground_truth_file)

    @property
    def train_path(self) -> str:
        return self.path(self.train_file)

    @property
    def test_path(self) -> str:
        return self.path(self.test_file)

    @property
    def test_with_actuals_path(self) -> str:
        return self.path(self.test_with_actuals_file)

    @property
    def final_output_path(self) -> str:
        return self.path(self.final_output_file)

    @property
    def model_path(self) -> str:
        return self.path(self.model_file)

    @property
    def index_path(self) -> str:
        return self.path(self.index_file)

    def with_(self, **kwargs) -> "Config":
        return replace(self, **kwargs)


_DEFAULT: Config | None = None


def get_config() -> Config:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = Config()
    return _DEFAULT


def set_config(config: Config) -> None:
    global _DEFAULT
    _DEFAULT = config

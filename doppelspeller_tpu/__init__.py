"""doppelspeller_tpu — a TPU-native (JAX/XLA/Pallas) fuzzy-title matching framework.

Re-implements the capabilities of the reference `doppel-speller` project
(misspelled-title → best truth-title matching) as a TPU-first design:

* an HBM-resident, bit-packed n-gram×title index scored with blocked MXU
  matmuls fused with top-k selection (reference: numba `fast_jaccard` +
  scipy sparse, match_maker.py:16-203),
* a batched LCS/Levenshtein-ratio kernel computed as a vectorized
  cummax-scan DP over padded uint8 char tensors (reference: numba
  `fast_levenshtein_ratio`, feature_engineering.py:25-63),
* a vectorized 66-dim feature kernel (reference: numba `construct_features`,
  feature_engineering.py:66-169),
* a gradient-boosted-tree model trained ON TPU with the reference's custom
  weighted-log-loss objective and custom-error metric (reference: XGBoost,
  train.py:17-137), with tensorized device-side inference,
* a truth index sharded across a `jax.sharding.Mesh` with per-shard top-k
  merged via ICI all-gather (new capability; the reference is single-node).
"""

__version__ = "0.1.0"
__build__ = "tpu"

module_name = "doppelspeller_tpu"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first-ever compiles through a
    remote-compile TPU tunnel cost 30-90 s; cached reloads are ~0.2 s).
    Opt out with DOPPEL_NO_COMPILE_CACHE=1 or point JAX_COMPILATION_CACHE_DIR
    elsewhere."""
    import os

    if os.environ.get("DOPPEL_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/doppel_jax_cache"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

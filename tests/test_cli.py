"""CLI smoke tests (click runner, tiny data, CPU)."""

import gzip
import os

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner



@pytest.fixture()
def cli_env(tmp_path, monkeypatch):
    """Point PROJECT_DATA_PATH at a tiny staged dataset."""
    monkeypatch.setenv("PROJECT_DATA_PATH", str(tmp_path))
    # reset the config singleton so it picks up the env var
    from doppelspeller_tpu.config import Config, set_config

    cfg = Config(
        data_path=str(tmp_path),
        title_block=128,
        query_block=8,
        pair_block=64,
        top_n_predicting=15,
        top_n_training=5,
        gbt_num_boost_round=15,
        gbt_early_stopping_rounds=15,
        score_dtype="float32",
    )
    set_config(cfg)
    yield cfg
    set_config(Config())


def _make_tiny_dataset(cfg):
    rng = np.random.RandomState(0)
    truth_titles = [
        f"{w} holdings {i}" for i, w in enumerate(
            ["alpha", "bravo", "carlo", "delta", "echos", "forte", "gamma",
             "hotel", "india", "julie", "kilos", "limas", "miked", "novel",
             "oscar", "papas", "quick", "romeo", "sierra", "tango"] * 5
        )
    ]
    truth = pd.DataFrame(
        {"company_id": range(1, len(truth_titles) + 1), "name": truth_titles}
    )
    truth.to_csv(cfg.ground_truth_path, sep="|", index=False)
    train = pd.DataFrame({
        "train_index": range(30),
        "name": [truth_titles[i] + "x" for i in range(20)]
        + [f"zzz unknown {i}" for i in range(10)],
        "company_id": [i + 1 for i in range(20)] + [-1] * 10,
    })
    train.to_csv(cfg.train_path, sep="|", index=False)
    test = pd.DataFrame({
        "test_index": range(20),
        "name": [truth_titles[i] for i in range(10)]
        + [f"yyy unknown {i}" for i in range(10)],
    })
    test.to_csv(cfg.test_path, sep="|", index=False)
    actuals = test.copy()
    actuals["company_id"] = [i + 1 for i in range(10)] + [-1] * 10
    actuals.to_csv(cfg.test_with_actuals_path, sep="|", index=False)


def test_cli_full_flow(cli_env):
    from doppelspeller_tpu.cli import cli

    cfg = cli_env
    _make_tiny_dataset(cfg)
    runner = CliRunner()

    r = runner.invoke(cli, ["-vv", "build-index"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert os.path.exists(cfg.index_path)

    r = runner.invoke(cli, ["-v", "train-model"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert os.path.exists(cfg.model_path)

    r = runner.invoke(cli, ["-v", "generate-predictions"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert os.path.exists(cfg.final_output_path)

    r = runner.invoke(cli, ["-v", "get-predictions-accuracy"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert "Correctly matched titles" in r.output

    # multi-device mesh: same output file contents
    single = pd.read_csv(cfg.final_output_path, sep="|")
    r = runner.invoke(
        cli, ["-v", "generate-predictions", "--devices", "8", "--platform", "cpu"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    meshed = pd.read_csv(cfg.final_output_path, sep="|")
    pd.testing.assert_frame_equal(single, meshed)

    # exact queries must all be correct (stage 1)
    out = pd.read_csv(cfg.final_output_path, sep="|")
    assert (out.set_index("test_index").loc[range(10), "title_id"].values
            == np.arange(1, 11)).all()


def test_cli_single_title(cli_env):
    from doppelspeller_tpu.cli import cli

    cfg = cli_env
    _make_tiny_dataset(cfg)
    runner = CliRunner()
    runner.invoke(cli, ["-v", "train-model"], catch_exceptions=False)
    r = runner.invoke(
        cli, ["-v", "closest-search-single-title", "-t", "alpha holdings 0"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "match_title_id" in r.output


def test_cli_serve(cli_env):
    """The serve loop answers bare-title, JSON-single and batch requests,
    survives malformed input, and keeps one warm engine across requests."""
    import json

    from doppelspeller_tpu.cli import cli

    cfg = cli_env
    _make_tiny_dataset(cfg)
    runner = CliRunner()
    runner.invoke(cli, ["-v", "train-model"], catch_exceptions=False)

    requests = "\n".join([
        "alpha holdings 0",
        json.dumps({"id": 42, "title": "bravo holdngs 1"}),
        json.dumps({"titles": ["carlo holdings 2", "zzz no such co"]}),
        "{not json",
        # a bare string is iterable — must be rejected, not matched per char
        json.dumps({"titles": "carlo holdings 2"}),
        json.dumps({"titles": ["ok", 7]}),
        json.dumps({"titles": []}),
        "",
    ]) + "\n"
    r = runner.invoke(cli, ["-v", "serve", "--no-warmup"], input=requests,
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    lines = [json.loads(ln) for ln in r.output.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 7
    exact, single, batch, bad, str_titles, mixed_titles, empty = lines
    assert exact["match_title_id"] == 1 and exact["prediction"] == 1.0
    assert single["test_index"] == 42 and single["match_title_id"] == 2
    assert [x["match_title_id"] for x in batch["results"]] == [3, -1]
    assert batch["results"][0]["prediction"] == 1.0
    assert "error" in bad
    assert "list of strings" in str_titles.get("error", "")
    assert "list of strings" in mixed_titles.get("error", "")
    assert empty == {"results": [], "latency_ms": 0.0}

    # mesh serving: same answers from an 8-device sharded engine
    r = runner.invoke(
        cli, ["-v", "serve", "--no-warmup", "--devices", "8",
              "--platform", "cpu"],
        input=requests, catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    mlines = [json.loads(ln) for ln in r.output.splitlines()
              if ln.startswith("{")]
    assert [m.get("match_title_id") for m in mlines[:2]] == [1, 2]
    assert [x["match_title_id"] for x in mlines[2]["results"]] == [3, -1]


def test_cli_stage_example_data(cli_env, tmp_path):
    from doppelspeller_tpu.cli import cli

    src = tmp_path / "src"
    src.mkdir()
    with gzip.open(src / "example_truth.csv.gz", "wb") as f:
        f.write(b"company_id|name\n1|abc\n")
    runner = CliRunner()
    r = runner.invoke(
        cli, ["stage-example-data-set", "--source", str(src)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert os.path.exists(cli_env.path("example_truth.csv"))

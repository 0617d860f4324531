"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("PROJECT_DATA_PATH", "/tmp/doppel_tpu_test_data")

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (overriding the
# env var), which would silently run "CPU" tests on the one real TPU chip.
# Override it back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

os.makedirs(os.environ["PROJECT_DATA_PATH"], exist_ok=True)

EXAMPLE_DATASET_DIR = pathlib.Path("/root/reference/example_dataset")


@pytest.fixture(scope="session")
def example_data_dir(tmp_path_factory):
    """Decompress the example dataset once per session (if available)."""
    import gzip
    import shutil

    if not EXAMPLE_DATASET_DIR.exists():
        pytest.skip("example dataset not available")
    out = tmp_path_factory.mktemp("example_data")
    for gz in EXAMPLE_DATASET_DIR.glob("*.csv.gz"):
        with gzip.open(gz, "rb") as f_in, open(out / gz.name[:-3], "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
    return out


@pytest.fixture()
def small_config(tmp_path):
    """A Config with tiny blocking knobs suitable for CPU tests."""
    from doppelspeller_tpu.config import Config

    return Config(
        data_path=str(tmp_path),
        title_block=128,
        query_block=8,
        pair_block=64,
        score_dtype="float32",
    )

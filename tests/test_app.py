"""App-layer tests: figure JSON schema, file protocol, CLI end-to-end."""

import json

import numpy as np
import pytest

from image_generation_tpu.app.cli import main as cli_main
from image_generation_tpu.app.figures import imshow_figure, loss_figure, topology_figure
from image_generation_tpu.app.files import RunFiles
from image_generation_tpu.utils.topology import graph_layout, zephyr_graph


def test_imshow_figure_schema():
    img = np.random.RandomState(0).rand(8, 10, 1)
    fig = imshow_figure(img)
    assert fig["data"][0]["type"] == "heatmap"
    assert len(fig["data"][0]["z"]) == 8
    assert len(fig["data"][0]["z"][0]) == 10
    json.dumps(fig)  # serializable


def test_loss_figure_schema():
    fig = loss_figure([1.0, 0.5, 0.25])
    assert fig["data"][0]["y"] == [1.0, 0.5, 0.25]
    assert fig["layout"]["xaxis"]["title"]["text"] == "Batch"
    json.dumps(fig)


def test_topology_figure():
    g = zephyr_graph(2)
    pos = graph_layout(g)
    vals = [1.0 if i % 2 else -1.0 for i in range(g.number_of_nodes())]
    fig = topology_figure(g, pos, vals)
    assert len(fig["data"]) == 2  # edges + nodes
    assert len(fig["data"][1]["x"]) == g.number_of_nodes()
    json.dumps(fig)


def test_runfiles_protocol(tmp_path):
    rf = RunFiles(tmp_path)
    grid = np.zeros((4, 4, 1))
    rf.write_epoch(0, grid, grid, [1.0], [2.0])
    assert rf.read_epoch_figure("generated", 0) is not None
    assert rf.read_epoch_figure("loss_mse", 0)["data"][0]["y"] == [1.0]
    assert rf.read_epoch_figure("generated", 1) is None  # not written yet
    rf.write_progress(3, 10)
    assert rf.read_progress() == {"step": 3, "total": 10}
    rf.write_progress(3, 10, batch=117, n_batches=468)  # batch-granular form
    assert rf.read_progress() == {"step": 3, "total": 10, "batch": 117, "n_batches": 468}
    rf.write_problem_details(
        "Advantage2_system1", 32, 100, 64, "gibbs",
        extra={"Epoch": "3/10", "Learning rate DVAE": "1.000E-04"},
    )
    details = json.loads((rf.dir / "problem_details.json").read_text())
    assert details["Couplers"] == 100
    assert details["QPU"] == "Advantage2_system1"
    assert details["Epoch"] == "3/10"  # reference per-epoch headers
    rf.write_latent_encoded([1.0, -1.0])
    assert (tmp_path / "assets/model_diagram/latent_encoded.json").exists()
    # corrupt file → None, not crash (the reference treats it as
    # "epoch not done", demo_callbacks.py:564-566)
    (rf.dir / "generated_epoch_5.json").write_text("{not json")
    assert rf.read_epoch_figure("generated", 5) is None
    rf.clean()
    assert rf.read_progress() is None


def test_cli_mesh_parsing():
    """--mesh accepts auto/off/count/RxG and rejects garbage cleanly."""
    from image_generation_tpu.app.cli import parse_mesh

    assert parse_mesh("auto") == "auto"
    assert parse_mesh(None) is None
    assert parse_mesh("off") is None
    m = parse_mesh("8")
    assert m.devices.shape == (4, 2)
    m = parse_mesh("2x4")
    assert m.devices.shape == (2, 4) and m.axis_names == ("data", "chain")
    m = parse_mesh("2X4")  # case-insensitive separator
    assert m.devices.shape == (2, 4)
    for bad in ("garbage", "2xfoo", "0x8", "0", "-1", "1x0"):
        with pytest.raises(SystemExit, match="--mesh"):
            parse_mesh(bad)


@pytest.mark.slow
def test_cli_train_generate_tune(tmp_path):
    """Full CLI pass: train → artifacts → generate → tune."""
    common = [
        "--workdir", str(tmp_path), "train", "--name", "cli_test",
        "--qpu", "Advantage2_prototype", "--latents", "32",
        "--dataset-size", "64", "--batch-size", "16", "--sweeps", "2",
        "--epochs", "1",
    ]
    cli_main(common)
    model_dir = tmp_path / "models" / "cli_test"
    assert (model_dir / "dvae.pth").exists()
    assert (tmp_path / "generated_json" / "generated_epoch_0.json").exists()
    assert (tmp_path / "generated_json" / "loss_total_epoch_0.json").exists()
    params = json.loads((model_dir / "parameters.json").read_text())
    assert params["n_epochs"] == 1 and params["n_latents"] == 32

    # bare model NAME resolves under workdir/models (matches train --name
    # and the server's POST bodies); tune below keeps the explicit-path form
    # so both spellings stay covered
    cli_main([
        "--workdir", str(tmp_path), "generate", "--model", "cli_test",
        "--dataset-size", "64", "--batch-size", "16", "--num-reads", "16",
        "--sharpen",
    ])
    assert (tmp_path / "assets/model_diagram/latent_qpu.json").exists()

    cli_main([
        "--workdir", str(tmp_path), "tune", "--model", str(model_dir),
        "--dataset-size", "64", "--batch-size", "16", "--sweeps", "2",
        "--epochs", "1",
    ])
    tuned = tmp_path / "models" / "cli_test_tuned_1_epochs"
    assert (tuned / "dvae.pth").exists()
    tuned_params = json.loads((tuned / "parameters.json").read_text())
    assert tuned_params["n_epochs"] == 2  # 1 original + 1 tuned
    losses = json.loads((tuned / "losses.json").read_text())
    assert len(losses["mse_losses"]) == 8  # 4 batches × 2 epochs concatenated
    # content check: first half must be the ORIGINAL run's history (a
    # shallow-copy aliasing bug once made it the tuned losses duplicated)
    original = json.loads((model_dir / "losses.json").read_text())
    assert losses["mse_losses"][:4] == original["mse_losses"]
    assert losses["mse_losses"][4:] != original["mse_losses"]


def test_parse_pt_betas(tmp_path):
    from image_generation_tpu.app.cli import _parse_pt_betas

    assert _parse_pt_betas("0.25,0.5,1.0") == [0.25, 0.5, 1.0]
    p = tmp_path / "pt_betas.json"
    p.write_text(json.dumps({"betas": [0.3, 0.7, 1.0]}))
    assert _parse_pt_betas(str(p)) == [0.3, 0.7, 1.0]
    with pytest.raises(SystemExit, match="pt-betas"):
        _parse_pt_betas("0.25,garbage")
    # malformed tune-pt files must die with the crafted message, not a
    # raw KeyError/JSONDecodeError traceback
    for bad in ('{"nobetas": 1}', "{truncated", '{"betas": ["x"]}'):
        p.write_text(bad)
        with pytest.raises(SystemExit, match="tune-pt output"):
            _parse_pt_betas(str(p))


def test_parse_serving_args_matches_job_config():
    """The warm serving path must build its trainer from the same extra_cli
    flags the subprocess jobs get (server.py make_server)."""
    from image_generation_tpu.app.cli import _config_overrides, parse_serving_args

    args = parse_serving_args([
        "--sampler-matmul-dtype", "int8", "--sampler", "pt",
        "--pt-betas", "0.5,1.0", "--dataset-size", "64",
        "--artifact-every", "3",  # train-only flag: tolerated, ignored
    ])
    ov = _config_overrides(args)
    assert ov["SAMPLER_MATMUL_DTYPE"] == "int8"
    assert ov["SAMPLER"] == "pt"
    assert ov["PT_BETAS"] == [0.5, 1.0]
    assert ov["DATASET_SIZE"] == 64


def test_config_ladder_and_dtype_helpers():
    """TrainingConfig.initial_pt_betas / resolved_sampler_matmul_dtype are
    the single source of truth shared by step.py, trainer.py and tune-pt."""
    import jax.numpy as jnp
    import numpy as np

    from image_generation_tpu.config import TrainingConfig

    c = TrainingConfig(PT_NUM_BETAS=4, PT_BETA_MIN=0.25)
    np.testing.assert_allclose(
        c.initial_pt_betas(), np.geomspace(0.25, 1.0, 4))
    c2 = TrainingConfig(PT_BETAS=(0.3, 0.7, 1.0))
    np.testing.assert_allclose(c2.initial_pt_betas(), [0.3, 0.7, 1.0])
    assert c.resolved_sampler_matmul_dtype(2048) == jnp.bfloat16
    assert c.resolved_sampler_matmul_dtype(512) is None
    assert TrainingConfig(
        SAMPLER_MATMUL_DTYPE="int8").resolved_sampler_matmul_dtype(4096) is None
    assert TrainingConfig(
        SAMPLER_MATMUL_DTYPE="float32").resolved_sampler_matmul_dtype(4096) is None


@pytest.mark.slow
def test_cli_tune_pt_roundtrip(tmp_path):
    """train (PT sampler) → tune-pt writes pt_betas.json → generate with the
    tuned ladder (the CLI spelling of ops/pt_tune.py's offline loop)."""
    cli_main([
        "--workdir", str(tmp_path), "train", "--name", "ptm",
        "--qpu", "Advantage2_prototype", "--latents", "32",
        "--dataset-size", "32", "--batch-size", "16", "--sweeps", "2",
        "--epochs", "1", "--sampler", "pt",
    ])
    params = json.loads(
        (tmp_path / "models" / "ptm" / "parameters.json").read_text()
    )
    assert params["n_epochs"] == 1
    # the problem-details table surfaces live ladder health in PT mode
    details = json.loads(
        (tmp_path / "generated_json" / "problem_details.json").read_text()
    )
    assert "PT swap acceptance (min/mean)" in details
    cli_main([
        "--workdir", str(tmp_path), "tune-pt", "--model", "ptm",
        "--iters", "1", "--chains", "32",
    ])
    out = tmp_path / "models" / "ptm" / "pt_betas.json"
    meta = json.loads(out.read_text())
    betas = meta["betas"]
    assert betas[-1] == 1.0 and all(
        b2 > b1 for b1, b2 in zip(betas, betas[1:])
    )
    assert len(meta["accept_after"]) == len(betas) - 1
    cli_main([
        "--workdir", str(tmp_path), "generate", "--model", "ptm",
        "--num-reads", "16", "--pt-betas", str(out),
    ])
    gen = json.loads(
        (tmp_path / "generated_json" / "generated_epoch_0.json").read_text()
    )
    assert gen  # decoded grid written

    # PT_NUM_BETAS='auto' must NOT dead-end tune-pt (the auto resolver's
    # beyond-HBM error message points users here): the CLI swaps 'auto'
    # for the 16-rung geometric probe before load and the output records
    # the equal-barrier rung-count recommendation
    cli_main([
        "--workdir", str(tmp_path), "tune-pt", "--model", "ptm",
        "--iters", "1", "--chains", "32", "--pt-num-betas", "auto",
    ])
    meta2 = json.loads(out.read_text())
    assert len(meta2["betas"]) == 16
    assert meta2["recommended_num_betas"] >= 2


def test_validate_extra_cli():
    """app.py's pass-through flag list dies at startup on a typo instead of
    surfacing as a late job-subprocess failure (server.py main)."""
    from image_generation_tpu.app.cli import validate_extra_cli

    # real CLI flags pass, in both "--flag value" and "--flag=value" forms
    validate_extra_cli(
        ["--sampler-matmul-dtype", "int8", "--serve-max-batch=32",
         "--mesh", "off"]
    )
    validate_extra_cli([])
    with pytest.raises(SystemExit, match="--warm-genrate"):
        validate_extra_cli(["--warm-genrate"])

"""Config schema tests: YAML round-trip and reference-key compatibility."""

import pathlib

from image_generation_tpu.config import TrainingConfig

PKG_YAML = pathlib.Path("image_generation_tpu/training_parameters.yaml")


def test_defaults_match_reference_values():
    c = TrainingConfig()
    assert c.NUM_READS == 256
    assert c.BATCH_SIZE == 128
    assert c.N_REPLICAS == 8
    assert c.PREFACTOR == 0.05
    assert c.RANDOM_SEED == 775321899904
    assert c.AUTOENCODER_INITIAL_LR == 1e-4
    assert c.BM_FINAL_LR == 1e-4
    assert c.LOSS_FUNCTION == "mmd"


def test_packaged_yaml_loads_and_matches_defaults():
    c = TrainingConfig.from_yaml(PKG_YAML)
    d = TrainingConfig()
    assert c.NUM_READS == d.NUM_READS
    assert c.BATCH_SIZE == d.BATCH_SIZE
    assert c.LATENT_TO_DISCRETE == d.LATENT_TO_DISCRETE
    assert c.SAMPLER == d.SAMPLER


def test_reference_yaml_file_loads():
    """A parameter file written for the reference app loads unchanged
    (unknown keys ignored, known keys honored)."""
    ref = pathlib.Path("/root/reference/src/training_parameters.yaml")
    if not ref.exists():
        import pytest

        pytest.skip("reference not mounted")
    c = TrainingConfig.from_yaml(ref)
    assert c.NUM_READS == 256
    assert c.N_REPLICAS == 8
    assert c.MAX_DEQUE_SIZE == 4096


def test_yaml_roundtrip(tmp_path):
    c = TrainingConfig(N_LATENTS=64, SAMPLER="pt", PT_NUM_BETAS=16)
    c.to_yaml(tmp_path / "p.yaml")
    c2 = TrainingConfig.from_yaml(tmp_path / "p.yaml")
    assert c2.N_LATENTS == 64
    assert c2.SAMPLER == "pt"
    assert c2.PT_NUM_BETAS == 16
    assert tuple(c2.H_RANGE) == (-4.0, 4.0)


def test_overrides_win(tmp_path):
    c = TrainingConfig(BATCH_SIZE=999)
    c.to_yaml(tmp_path / "p.yaml")
    c2 = TrainingConfig.from_yaml(tmp_path / "p.yaml", BATCH_SIZE=16)
    assert c2.BATCH_SIZE == 16


def test_for_serving_int8_scale_gate():
    """Serving surfaces flip 'auto' to the quantized sampler at scale only
    (config.for_serving — the measured +71% request-rate lever, quality-
    neutral per runs/serving_quality_ab.json); explicit dtypes and training
    configs are never touched."""
    from image_generation_tpu.config import SERVING_INT8_MIN_LATENTS

    cfg = TrainingConfig()
    assert cfg.for_serving(256).SAMPLER_MATMUL_DTYPE == "auto"
    assert (
        cfg.for_serving(SERVING_INT8_MIN_LATENTS).SAMPLER_MATMUL_DTYPE
        == "int8"
    )
    assert cfg.for_serving(5640).SAMPLER_MATMUL_DTYPE == "int8"
    for explicit in ("float32", "bfloat16", "int8"):
        c = TrainingConfig(SAMPLER_MATMUL_DTYPE=explicit)
        assert c.for_serving(5640).SAMPLER_MATMUL_DTYPE == explicit
    # non-serving resolution is unchanged by the serving gate
    assert cfg.resolved_sampler_matmul_dtype(256) is None


def test_plrng_row_seed_validation():
    """PLRNG_ROW_SEED follows the on/off contract with YAML-1.1 bool
    normalization (a file saying ``PLRNG_ROW_SEED: on`` arrives as True)."""
    import pytest

    assert TrainingConfig().PLRNG_ROW_SEED == "off"
    assert TrainingConfig(PLRNG_ROW_SEED=True).PLRNG_ROW_SEED == "on"
    assert TrainingConfig(PLRNG_ROW_SEED=False).PLRNG_ROW_SEED == "off"
    with pytest.raises(ValueError, match="PLRNG_ROW_SEED"):
        TrainingConfig(PLRNG_ROW_SEED="auto")


def test_parse_overrides():
    """The shared --override KEY=VAL parser (scripts/serving_quality_ab.py,
    scripts/load_test_warm.py): YAML-typed values, loud failures."""
    import pytest

    d = TrainingConfig.parse_overrides(
        ["PT_NUM_BETAS=32", "SAMPLER=pt", "PT_BETAS=[0.5, 1.0]"]
    )
    assert d == {"PT_NUM_BETAS": 32, "SAMPLER": "pt", "PT_BETAS": [0.5, 1.0]}
    assert TrainingConfig.parse_overrides([]) == {}
    assert TrainingConfig.parse_overrides(None) == {}
    with pytest.raises(SystemExit, match="KEY=VAL"):
        TrainingConfig.parse_overrides(["NUM_READS"])
    with pytest.raises(SystemExit, match="not a TrainingConfig field"):
        TrainingConfig.parse_overrides(["NUM_REEDS=4"])


def test_for_serving_dir_reads_checkpoint_scale(tmp_path):
    """for_serving_dir is the ONE spelling both serving surfaces share
    (WarmGenerator._trainer_for, cli cmd_generate): the gate input comes
    from the checkpoint's own parameters.json, falling back to the
    config's N_LATENTS when the key (or file) is absent."""
    import json

    cfg = TrainingConfig()  # N_LATENTS default is small → 'auto' kept
    big = tmp_path / "big"
    big.mkdir()
    (big / "parameters.json").write_text(json.dumps({"n_latents": 5640}))
    assert cfg.for_serving_dir(big).SAMPLER_MATMUL_DTYPE == "int8"

    small = tmp_path / "small"
    small.mkdir()
    (small / "parameters.json").write_text(json.dumps({"n_latents": 256}))
    assert cfg.for_serving_dir(small).SAMPLER_MATMUL_DTYPE == "auto"

    empty = tmp_path / "empty"  # no parameters.json → config fallback
    empty.mkdir()
    assert cfg.for_serving_dir(empty).SAMPLER_MATMUL_DTYPE == "auto"
    assert (
        TrainingConfig(N_LATENTS=4096)
        .for_serving_dir(empty)
        .SAMPLER_MATMUL_DTYPE
        == "int8"
    )

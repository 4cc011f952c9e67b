"""Model-topology figure: physical-coordinate layout + spring fallback."""

import json

import numpy as np
import pytest

from image_generation_tpu.app.figures import model_topology_figure
from image_generation_tpu.config import TrainingConfig
from image_generation_tpu.training.trainer import Trainer


def test_topology_figure_with_physical_layout(tmp_path):
    cfg = TrainingConfig(
        N_LATENTS=32, NUM_READS=32, BATCH_SIZE=16, DATASET_SIZE=32,
        N_REPLICAS=1, GIBBS_SWEEPS=2, GIBBS_BURN_IN=2, QPU="Advantage2_prototype",
    )
    t = Trainer(config=cfg)
    t.train_init(n_epochs=1)
    assert len(t.physical_nodes) == 32
    out = t.save(tmp_path / "m", n_epochs=1)
    meta = json.loads((out / "parameters.json").read_text())
    assert len(meta["physical_nodes"]) == 32

    vals = [1.0 if i % 2 else -1.0 for i in range(32)]
    fig = model_topology_figure(out, vals)
    nodes = fig["data"][1]
    assert len(nodes["x"]) == 32
    # colors follow the spin values (demo GRAPH_COLORS convention)
    assert nodes["marker"]["color"][0] != nodes["marker"]["color"][1]
    # physical layout: coordinates normalized into [0,1]
    assert 0.0 <= min(nodes["x"]) and max(nodes["x"]) <= 1.0


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference/models").exists(),
    reason="reference checkpoints absent",
)
def test_topology_figure_reference_checkpoint_fallback():
    """Reference checkpoints lack physical_nodes → spring-layout fallback."""
    fig = model_topology_figure("/root/reference/models/Advantage2_system1_10_epochs")
    assert len(fig["data"][1]["x"]) == 256

"""Graph, data and small-utility layer (no JAX-traced code lives here)."""

from image_generation_tpu.utils.topology import (  # noqa: F401
    QPU_TOPOLOGIES,
    chimera_graph,
    graph_for_qpu,
    graph_layout,
    pegasus_graph,
    zephyr_graph,
)
from image_generation_tpu.utils.subgraph import (  # noqa: F401
    get_graph_mapping,
    greedy_get_subgraph,
    select_latent_graph,
)
from image_generation_tpu.utils.coloring import (  # noqa: F401
    ColorClasses,
    color_classes,
    greedy_coloring,
)
from image_generation_tpu.utils.sampleset import SampleSet  # noqa: F401

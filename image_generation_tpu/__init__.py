"""TPU-native discrete-VAE image-generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the D-Wave
``image-generation`` MNIST demo (reference: /root/reference): a Discrete
Variational Autoencoder (convolutional encoder/decoder with a ±1 spin latent
bottleneck and straight-through gradients) trained jointly with a
Graph-Restricted Boltzmann Machine prior over Pegasus/Zephyr/Chimera-topology
coupling graphs.  Where the reference samples a remote quantum annealer for
the GRBM negative phase (reference: src/model_wrapper.py:308-316), this
framework runs an on-device batched block-Gibbs / parallel-tempering sampler,
vmapped across chains and shardable over a TPU mesh, fused into a single
jitted training step.

Subpackages
-----------
``utils``     graph topologies (Pegasus/Zephyr/Chimera), subgraph selection,
              graph coloring, data pipeline, image-grid assembly.
``models``    Flax Encoder/Decoder/DVAE and the GRBM pytree.
``ops``       MMD + Gaussian-mixture kernel, losses, Gibbs kernels
              (pure-JAX reference and Pallas TPU), exact Boltzmann sampler.
``samplers``  sampler backends implementing the annealer-replacement API.
``parallel``  mesh construction and sharding rules.
``training``  schedules, optimizers, fused train step, Trainer (the
              ModelWrapper equivalent).
``io``        checkpoint interop (torch ``.pth`` read/write, native orbax).
``app``       application surface (CLI, file-protocol observability, figures).
"""

__version__ = "0.1.0"

from image_generation_tpu import utils, models, ops, samplers  # noqa: F401

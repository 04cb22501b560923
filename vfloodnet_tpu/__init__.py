"""V-FloodNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) water segmentation and
flood-depth estimation framework.

Re-designed from scratch with the capability set of xmlyqing00/V-FloodNet
(reference layout documented in SURVEY.md):

- ``models``    — Flax model definitions (AFB-URR video seg, LinkNet image seg,
                  detection models, body-mesh regression).
- ``memory``    — the Adaptive Feature Bank as a fixed-capacity functional state.
- ``ops``       — XLA/Pallas device ops (bank attention read, bank update,
                  connected components, waterline scan, resize, padding).
- ``parallel``  — device mesh / sharding / collectives.
- ``data``      — datasets and paired augmentations.
- ``pipelines`` — end-to-end task pipelines (image seg, video seg, depth
                  estimation, reference tracking, hydrograph).
- ``train``     — trainers.
- ``core``      — config tree, checkpointing, weight conversion.
- ``utils``     — palette/PNG IO, meters, visualization.
"""

__version__ = "0.1.0"

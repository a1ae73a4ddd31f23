"""RecNet-TPU: a TPU-native (JAX/XLA/Pallas) video-captioning framework.

A from-scratch rebuild of the capabilities of
hobincar/reconstruction-network-for-video-captioning (RecNet, CVPR 2018):
attention-RNN caption decoder over pre-extracted video features, global/local
feature reconstructors, greedy + beam decoding, and a JVM-free
BLEU/METEOR/CIDEr/ROUGE_L scoring suite — redesigned around `lax.scan`,
one jitted train step, fixed shapes, and `jax.sharding` meshes.
"""

__version__ = "0.1.0"

from recnet_tpu.config import SplitConfig, TrainConfig, EvalConfig

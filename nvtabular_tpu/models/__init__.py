"""Model-side utilities, TPU-native (pure JAX pytrees + optax).

Re-designs the reference's model integration layer
(nvtabular/framework_utils/{torch,tensorflow}/ — generic tabular MLP
``Model`` at framework_utils/torch/models.py:21-110, embedding layers at
torch/layers/embeddings.py:20-95, DLRM dot interaction at
tensorflow/layers/interaction.py:22, xDeepFM CIN at
tensorflow/layers/outer_product.py:19) as idiomatic JAX: parameters are
pytrees, forward passes are pure functions, everything jits and shards via
``jax.sharding`` (see nvtabular_tpu.parallel).
"""

from .layers import (
    dot_product_interaction,
    embedding_lookup,
    mlp_apply,
    mlp_init,
    multihot_embedding_lookup,
    xdeepfm_outer_product,
)
from .dlrm import (
    DLRMConfig,
    dlrm_forward,
    dlrm_init,
    dlrm_loss,
    dlrm_param_specs,
    make_synthetic_batch,
)
from .deepfm import (
    DCNConfig,
    DeepFMConfig,
    dcn_forward,
    dcn_init,
    dcn_loss,
    deepfm_forward,
    deepfm_init,
    deepfm_loss,
)
from .tabular_mlp import TabularMLPConfig, tabular_mlp_forward, tabular_mlp_init
from .training import make_step_fns, process_epoch, roc_auc

__all__ = [
    "DCNConfig",
    "DLRMConfig",
    "DeepFMConfig",
    "TabularMLPConfig",
    "dlrm_forward",
    "dlrm_init",
    "dlrm_loss",
    "dcn_forward",
    "dcn_init",
    "dcn_loss",
    "deepfm_forward",
    "deepfm_init",
    "deepfm_loss",
    "dlrm_param_specs",
    "dot_product_interaction",
    "embedding_lookup",
    "make_synthetic_batch",
    "make_step_fns",
    "mlp_apply",
    "mlp_init",
    "multihot_embedding_lookup",
    "process_epoch",
    "roc_auc",
    "tabular_mlp_forward",
    "tabular_mlp_init",
    "xdeepfm_outer_product",
]

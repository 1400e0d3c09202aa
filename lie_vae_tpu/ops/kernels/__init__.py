"""Pallas TPU kernels for the hot Lie-group math."""
from lie_vae_tpu.ops.kernels.so3_density import (  # noqa: F401
    so3_wrapped_log_density_pallas)
from lie_vae_tpu.ops.kernels.wigner_block import (  # noqa: F401
    block_wigner_matrix_multiply_pallas)
from lie_vae_tpu.ops.kernels.wigner_fused import (  # noqa: F401
    MAX_FUSED_SC, block_wigner_apply_fused_flat,
    block_wigner_apply_fused_rows, block_wigner_matrix_multiply_fused)

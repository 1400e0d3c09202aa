"""Pure-jnp SO(3) math and Wigner-D representations (reference: lie_tools.py)."""
from lie_vae_tpu.ops.so3 import (  # noqa: F401
    hat, vee, map_to_lie_algebra, map_to_lie_vector,
    rodrigues, expmap, logmap, log_map,
    s2s1rodrigues, s2s2_gram_schmidt, vector_to_eazyz,
    group_matrix_to_quaternions, quaternions_to_eazyz,
    group_matrix_to_eazyz, eazyz_to_group_matrix,
    quaternions_to_group_matrix,
    random_quaternions, random_group_matrices,
)
from lie_vae_tpu.ops.wigner import (  # noqa: F401
    j_matrix, z_rot_mat, wigner_d_matrix,
    block_wigner_matrix, block_wigner_matrix_multiply,
    block_wigner_apply_zjz,
)

from pgmvae_tpu.data.loader import (  # noqa: F401
    load_split,
    load_binary_csv,
    leave_one_out_index,
    leave_one_out,
)

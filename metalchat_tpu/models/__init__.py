"""Model family implementations (functional, scan-over-layers)."""

from metalchat_tpu.models.transformer import (  # noqa: F401
    forward,
    init_random_params,
    make_rope_tables,
)

"""Model I/O: safetensors documents, repositories, weight loaders."""

from metalchat_tpu.io.safetensors import (  # noqa: F401
    SafetensorsDocument,
    ShardedSafetensorsDocument,
    open_safetensors,
    parse_header,
    save_safetensors,
)

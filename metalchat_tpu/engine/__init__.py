"""Serving engine: jitted prefill/decode steps, generation loops,
continuous batching scheduler, paged KV."""

from metalchat_tpu.engine.generate import (  # noqa: F401
    DecodeState,
    generate,
    generate_stream,
    make_decode_step,
    make_prefill,
)
from metalchat_tpu.engine.speculative import speculative_generate  # noqa: F401,E402

"""Tokenization stack (reference: include/metalchat/text/, SURVEY.md §2.5)."""

from metalchat_tpu.text.tokenizer import TokenKind, Tokenizer, SpecialToken  # noqa: F401
from metalchat_tpu.text.bpe import BytePairEncoder  # noqa: F401
from metalchat_tpu.text.gpt2 import bytes_to_unicode, gpt2_decode, gpt2_encode  # noqa: F401
from metalchat_tpu.text.loaders import (  # noqa: F401
    load_hf_tokenizer_json,
    load_tiktoken_model,
    llama3_special_tokens,
)

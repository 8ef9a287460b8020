"""Text-stack tests with true parity oracles.

The reference checks tokenizer parity against fixture vocabularies
(test_bpe.cc:37-121). Here we go further: we train/construct real artifacts
with the `tokenizers` / `tiktoken` libraries and assert exact token-id parity
with our from-scratch implementation.
"""

import base64
import json

import pytest

from metalchat_tpu.text import (
    BytePairEncoder,
    TokenKind,
    bytes_to_unicode,
    gpt2_decode,
    gpt2_encode,
    load_hf_tokenizer_json,
    load_tiktoken_model,
    llama3_special_tokens,
)
from metalchat_tpu.text.bpe import LLAMA3_SPLIT_PATTERN
from metalchat_tpu.text.loaders import load_tokenizer
from metalchat_tpu.text.sentencepiece import SentencePieceTokenizer
from metalchat_tpu.text.tokenizer import StreamingDecoder, decode_stream

SAMPLES = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "  leading and   trailing spaces  ",
    "tabs\tand\nnewlines\r\n\r\n",
    "numbers 123 4567 89, punct!!! ...",
    "unicode: héllo wörld — ¿qué? 你好世界 🦜🌴",
    "code: def f(x): return x**2  # comment",
    "don't can't won't it's I'll you're we've",
    "",
]


def test_gpt2_codec_bijection():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    for raw in [b"hello", bytes(range(256)), "héllo🦜".encode()]:
        assert gpt2_decode(gpt2_encode(raw)) == raw


# ---------------------------------------------------------------- HF oracle


@pytest.fixture(scope="module")
def trained_hf_tokenizer(tmp_path_factory):
    """Train a real byte-level BPE with HF `tokenizers` as the parity oracle."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Split(
                pattern=__import__("tokenizers").Regex(LLAMA3_SPLIT_PATTERN),
                behavior="isolated",
            ),
            pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600, special_tokens=["<|begin_of_text|>", "<|eot_id|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = SAMPLES * 20 + ["the quick brown fox " * 50, "hello world " * 50]
    tok.train_from_iterator(corpus, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, path


def test_hf_bpe_parity(trained_hf_tokenizer):
    oracle, path = trained_hf_tokenizer
    ours = load_hf_tokenizer_json(path)
    for text in SAMPLES:
        expect = oracle.encode(text, add_special_tokens=False).ids
        got = ours.encode(text)
        assert got == expect, f"mismatch on {text!r}: {got} != {expect}"
        assert ours.decode(got) == oracle.decode(expect, skip_special_tokens=False)


def test_hf_special_tokens(trained_hf_tokenizer):
    _, path = trained_hf_tokenizer
    ours = load_hf_tokenizer_json(path)
    assert "<|begin_of_text|>" in ours.specials
    ids = ours.encode("<|begin_of_text|>hi<|eot_id|>", allow_special=True)
    assert ids[0] == ours.specials.id_of("<|begin_of_text|>")
    assert ids[-1] == ours.specials.id_of("<|eot_id|>")
    # Without allow_special the literal text is tokenized, not mapped.
    plain = ours.encode("<|begin_of_text|>", allow_special=False)
    assert plain != [ours.specials.id_of("<|begin_of_text|>")]


# ----------------------------------------------------------- tiktoken oracle


@pytest.fixture(scope="module")
def tiny_tiktoken(tmp_path_factory):
    """Construct a custom tiktoken encoding + the equivalent tokenizer.model."""
    import tiktoken

    words = [
        "he", "ll", "o", "hell", "hello", " w", "or", "ld", " wor", " world",
        "th", "e", " the", "qu", "ick", " qu", " quick",
    ]
    ranks = {bytes([b]): b for b in range(256)}
    for i, w in enumerate(words):
        ranks[w.encode()] = 256 + i
    enc = tiktoken.Encoding(
        name="tiny",
        pat_str=LLAMA3_SPLIT_PATTERN,
        mergeable_ranks=ranks,
        special_tokens={"<|eot|>": 256 + len(words)},
    )
    path = tmp_path_factory.mktemp("tik") / "tokenizer.model"
    lines = [
        f"{base64.b64encode(tok).decode()} {rank}" for tok, rank in ranks.items()
    ]
    path.write_text("\n".join(lines))
    return enc, path, ranks


def test_tiktoken_parity(tiny_tiktoken):
    enc, path, ranks = tiny_tiktoken
    ours = load_tiktoken_model(path, special_tokens=["<|eot|>"])
    for text in SAMPLES + ["hello world the quick"]:
        expect = enc.encode_ordinary(text)
        got = ours.encode(text)
        assert got == expect, f"mismatch on {text!r}"
        assert ours.decode(got) == enc.decode(expect)


def test_llama3_special_token_layout():
    names = llama3_special_tokens()
    assert len(names) == 256
    assert names[0] == "<|begin_of_text|>"
    assert names[9] == "<|eot_id|>"
    assert names[10] == "<|python_tag|>"


# ------------------------------------------------------------ sentencepiece


@pytest.fixture()
def sp_tokenizer():
    pieces = ["▁the", "▁quick", "▁fox", "th", "qu", "ick", "▁", "t", "h", "e",
              "q", "u", "i", "c", "k", "f", "o", "x", "▁t", "he"]
    vocab = {}
    vocab[b"<pad>"] = 0
    vocab[b"<unk>"] = 1
    for b in range(256):
        vocab[b"<0x%02X>" % b] = 2 + b
    for i, p in enumerate(pieces):
        vocab[p.encode()] = 258 + i
    merges = {
        (b"\xe2\x96\x81", b"the"): 0,
        (b"t", b"h"): 1,
        (b"th", b"e"): 2,
        (b"\xe2\x96\x81", b"t"): 3,
        (b"h", b"e"): 4,
        (b"q", b"u"): 5,
        (b"i", b"c"): 6,
        (b"ic", b"k"): 7,
        (b"qu", b"ick"): 8,
        (b"\xe2\x96\x81", b"quick"): 9,
        (b"ic", b"k"): 7,
    }
    # vocab needs merge products present
    for extra in ["the", "ic", "ick", "quick", "▁quick", "▁the"]:
        vocab.setdefault(extra.encode(), len(vocab) + 300)
    return SentencePieceTokenizer(vocab, merges)


def test_sentencepiece_whitespace(sp_tokenizer):
    ids = sp_tokenizer.encode("the quick")
    text = sp_tokenizer.decode(ids)
    assert text == "the quick"


def test_sentencepiece_byte_fallback(sp_tokenizer):
    # "Z" is not in the vocab → encoded through <0x5A>.
    ids = sp_tokenizer.encode("Z")
    assert ids == [2 + 0x5A]
    assert sp_tokenizer.decode(ids) == "Z"
    # Multi-byte unicode falls back byte-per-byte and reassembles on decode.
    ids = sp_tokenizer.encode("é")
    assert sp_tokenizer.decode(ids) == "é"


# ---------------------------------------------------------------- streaming


def test_streaming_decoder_splits_multibyte(tiny_tiktoken):
    _, path, _ = tiny_tiktoken
    ours = load_tiktoken_model(path, special_tokens=[])
    # 🦜 is 4 utf-8 bytes → 4 single-byte tokens in the tiny vocab.
    ids = ours.encode("🦜")
    assert len(ids) == 4
    dec = StreamingDecoder(ours)
    chunks = [dec.feed(t) for t in ids]
    assert "".join(chunks) + dec.flush() == "🦜"
    assert chunks[0] == chunks[1] == chunks[2] == ""  # buffered, no mojibake
    assert "".join(decode_stream(ours, ids)) == "🦜"


def test_load_tokenizer_dispatch(tmp_path, tiny_tiktoken):
    _, path, _ = tiny_tiktoken
    (tmp_path / "tokenizer.model").write_text(path.read_text())
    tok = load_tokenizer(tmp_path)
    assert tok.encode("hello") == [256 + 4]
    with pytest.raises(FileNotFoundError):
        load_tokenizer(tmp_path / "nope")

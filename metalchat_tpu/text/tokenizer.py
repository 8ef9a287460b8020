"""Tokenizer interface, token kinds, and streaming decode.

TPU-native analog of the reference's `basic_tokenizer` virtual interface +
`tokenizer_traits` (include/metalchat/text/tokenizer.h:41-250) and the
`tokenkind` bitmask (tokenizer.h:20-39). The type-erased output iterators of
the C++ API become ordinary Python iterators; the incremental UTF-8 decoder
supports the interpreter's token-at-a-time streaming (the C++ side streams
raw bytes through std::ostream and relies on terminal UTF-8 handling).
"""

from __future__ import annotations

import codecs
import enum
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Protocol, Sequence


class TokenKind(enum.IntFlag):
    """Bitmask of special-token roles (reference: text/tokenizer.h:20-39)."""

    NONE = 0
    BEGIN_TEXT = 1 << 0
    END_TEXT = 1 << 1
    BEGIN_HEADER = 1 << 2
    END_HEADER = 1 << 3
    END_TURN = 1 << 4
    END_MESSAGE = 1 << 5
    IPYTHON = 1 << 6
    PAD = 1 << 7
    UNKNOWN = 1 << 8
    RESERVED = 1 << 9
    CONTROL = 1 << 10


@dataclass(frozen=True)
class SpecialToken:
    text: str
    id: int
    kind: TokenKind = TokenKind.CONTROL


class Tokenizer(Protocol):
    """Minimal tokenizer protocol every backend implements."""

    def encode(self, text: str, *, allow_special: bool = False) -> List[int]: ...

    def decode(self, ids: Sequence[int]) -> str: ...

    def token_bytes(self, token_id: int) -> bytes: ...

    @property
    def vocab_size(self) -> int: ...


@dataclass
class SpecialTokenRegistry:
    """Control-token registry (reference: bpe.h control-token registry +
    tokenizer_traits kind lookups)."""

    tokens: Dict[str, SpecialToken] = field(default_factory=dict)

    def add(self, text: str, id: int, kind: TokenKind = TokenKind.CONTROL) -> None:
        self.tokens[text] = SpecialToken(text, id, kind)

    def __contains__(self, text: str) -> bool:
        return text in self.tokens

    def id_of(self, text: str) -> int:
        return self.tokens[text].id

    def by_id(self, token_id: int) -> Optional[SpecialToken]:
        for t in self.tokens.values():
            if t.id == token_id:
                return t
        return None

    def ids_with_kind(self, kind: TokenKind) -> List[int]:
        return [t.id for t in self.tokens.values() if t.kind & kind]

    def items(self):
        return self.tokens.items()


class StreamingDecoder:
    """Incremental token→text decoder.

    Buffers partial UTF-8 sequences so multi-byte characters split across
    tokens render correctly, one `feed` per generated token (used by the chat
    interpreter's decode loop, reference interpreter.h:358-374).
    """

    def __init__(self, tokenizer: Tokenizer):
        self._tokenizer = tokenizer
        self._decoder = codecs.getincrementaldecoder("utf-8")("replace")

    def feed(self, token_id: int) -> str:
        try:
            raw = self._tokenizer.token_bytes(token_id)
        except ValueError:
            raw = "\ufffd".encode("utf-8")  # out-of-vocab id: never crash
        return self._decoder.decode(raw)

    def flush(self) -> str:
        return self._decoder.decode(b"", final=True)


def decode_stream(tokenizer: Tokenizer, ids: Iterable[int]) -> Iterable[str]:
    """Yield text chunks for a stream of token ids (tokenizer_traits analog)."""
    dec = StreamingDecoder(tokenizer)
    for tid in ids:
        chunk = dec.feed(tid)
        if chunk:
            yield chunk
    tail = dec.flush()
    if tail:
        yield tail

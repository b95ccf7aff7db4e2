"""Text tokenizer: GPT-2-style BPE over the CosyVoice multilingual vocab.

Reference behavior: cosyvoice/tokenizer/tokenizer.py:169-238 (tiktoken
Encoding built from a base64 rank file plus ~1.7k special tokens appended to
reach text_token_size=51866).

The rank file is a model ASSET (like the .pt weights), not code — it is loaded
at runtime from the pretrained model dir / a configurable path.  Special
tokens never occur in normalized user text, so for encode-parity of real text
only the mergeable ranks and the split pattern matter; the special-token tail
is synthesized as placeholders to reach the same explicit vocab size
(placeholder names differ, IDs and plain-text encodings are identical).
"""

from __future__ import annotations

import base64
import os
from functools import lru_cache
from typing import List, Optional

_VOCAB_SEARCH_PATHS = [
    os.environ.get("COSY_TPU_TOKENIZER_VOCAB", ""),
    "pretrained_models/CosyVoice-300M/multilingual_zh_ja_yue_char_del.tiktoken",
    "/root/reference/cosyvoice_flow_finetune/cosyvoice/tokenizer/assets/multilingual_zh_ja_yue_char_del.tiktoken",
]

# GPT-2 split pattern (public; openai/tiktoken)
_PAT_STR = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

TEXT_TOKEN_SIZE = 60515  # CosyVoice-300M text_token_size (58836 ranks + specials)


def find_vocab_file(path: Optional[str] = None) -> Optional[str]:
    candidates = ([path] if path else []) + _VOCAB_SEARCH_PATHS
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


class TextTokenizer:
    """Encode normalized text to LLM text-token ids."""

    def __init__(self, vocab_path: Optional[str] = None, explicit_n_vocab: int = TEXT_TOKEN_SIZE):
        import tiktoken

        vocab = find_vocab_file(vocab_path)
        if vocab is None:
            raise FileNotFoundError(
                "tokenizer vocab not found; set COSY_TPU_TOKENIZER_VOCAB or place "
                "multilingual_zh_ja_yue_char_del.tiktoken in the pretrained model dir")
        ranks = {
            base64.b64decode(tok): int(rank)
            for tok, rank in (line.split() for line in open(vocab) if line.strip())
        }
        n = len(ranks)
        n_special = max(1, explicit_n_vocab - n)
        explicit_n_vocab = n + n_special
        special = {"<|endoftext|>": n}
        special.update({f"<|special_{i}|>": n + i for i in range(1, n_special)})
        self.encoding = tiktoken.Encoding(
            name=os.path.basename(vocab),
            explicit_n_vocab=explicit_n_vocab,
            pat_str=_PAT_STR,
            mergeable_ranks=ranks,
            special_tokens=special,
        )
        self.vocab_size = explicit_n_vocab

    def encode(self, text: str) -> List[int]:
        return self.encoding.encode(text)

    def decode(self, ids: List[int]) -> str:
        return self.encoding.decode(ids)


@lru_cache(maxsize=1)
def default_tokenizer() -> TextTokenizer:
    return TextTokenizer()


# ---------------------------------------------------------------------------
# CosyVoice2 text tokenizer (Qwen2 BPE)
# ---------------------------------------------------------------------------

# Reference: cosyvoice/tokenizer/tokenizer.py:241-261 — the exact special
# tokens CosyVoice2 appends to the stock Qwen2 tokenizer.  Order matters:
# added ids are assigned sequentially after the base vocab.
QWEN_SPECIAL_TOKENS = {
    "eos_token": "<|endoftext|>",
    "pad_token": "<|endoftext|>",
    "additional_special_tokens": [
        "<|im_start|>", "<|im_end|>", "<|endofprompt|>",
        "[breath]", "<strong>", "</strong>", "[noise]",
        "[laughter]", "[cough]", "[clucking]", "[accent]",
        "[quick_breath]",
        "<laughter>", "</laughter>",
        "[hissing]", "[sigh]", "[vocalized-noise]",
        "[lipsmack]", "[mn]",
    ],
}


class QwenTokenizer:
    """CosyVoice2 text tokenizer (reference tokenizer.py:241-279).

    Wraps the HF tokenizer found at ``token_path`` (the CosyVoice2 model dir
    ships the Qwen2 tokenizer files; this image has no copy, so construction
    requires a real model dir) and registers the CosyVoice2 special-token
    set.  ``encode`` returns plain python ids; ``decode`` drops special
    tokens by default, matching the reference.
    """

    def __init__(self, token_path: str, skip_special_tokens: bool = True):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(token_path)
        self.tokenizer.add_special_tokens(QWEN_SPECIAL_TOKENS)
        self.skip_special_tokens = skip_special_tokens

    @property
    def vocab_size(self) -> int:
        return len(self.tokenizer)

    def encode(self, text: str, **kwargs) -> List[int]:
        return self.tokenizer([text])["input_ids"][0]

    def decode(self, ids: List[int]) -> str:
        return self.tokenizer.batch_decode(
            [ids], skip_special_tokens=self.skip_special_tokens)[0]


@lru_cache(maxsize=None)
def get_qwen_tokenizer(token_path: str, skip_special_tokens: bool = True) -> QwenTokenizer:
    return QwenTokenizer(token_path, skip_special_tokens)

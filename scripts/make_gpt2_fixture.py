#!/usr/bin/env python
"""Generate the vendored GPT-2-format BPE fixture (offline-safe).

The reference's text signal tokenizes with the hub ``gpt2`` tokenizer
(reference text_entropy.py:31-38).  The hub is unreachable from this
environment, so true-parity tests vendor a SMALL byte-level BPE in the
exact GPT-2 serialization (``vocab.json`` + ``merges.txt``, byte-level
alphabet, ``<|endoftext|>`` special token) under
``tests/fixtures/gpt2_mini/``.  The encoding ALGORITHM — the GPT-2 regex
pretokenizer, the bytes<->unicode table, merge resolution, special-token
handling — is vocabulary-independent, so parity of our adapter against
``transformers.GPT2Tokenizer`` loaded from these files exercises the same
reference behavior the hub vocabulary would (only the merge table is
smaller).

Deterministic: fixed training corpus, fixed vocab size.  Rerunning
regenerates identical files.
"""

from __future__ import annotations

import sys
from pathlib import Path

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "gpt2_mini"

# A fixed, diverse training corpus: English prose with contractions,
# numbers, punctuation runs, unicode, code-ish text, whitespace shapes —
# the pretokenizer classes the parity tests exercise.
CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "Don't stop believing; it's what we're here for, isn't it?",
    "I'm sure they'll've finished by 2026-08-19 at 12:30pm.",
    "Entropy-weighted indexing scores every document by useful surprise.",
    "    indented code block\n\ttab\tseparated\tvalues\n",
    "naive cafe resume — em-dash and accents: déjà vu, São Paulo.",
    "Numbers: 0 1 22 333 4444 55555 3.14159 1e-8 0xFF.",
    "CamelCaseIdentifiers and snake_case_names and kebab-case-names.",
    "Multiple   spaces    between     words.",
    "Unicode: 中文测试 русский ελληνικά عربى 日本語 한국어.",
    "Emoji: 🙂 🚀 🧪 and combining é accents.",
    "def f(x):\n    return x ** 2  # comment\n",
    "HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n",
    "\"Quoted 'nested' strings\" and (parenthetical [brackets] {braces}).",
] * 64  # repetition stabilizes merge frequencies -> deterministic table


def main() -> int:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=1024,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    tok.model.save(str(FIXTURE_DIR))  # vocab.json + merges.txt (gpt2 format)
    print(f"wrote {FIXTURE_DIR}/vocab.json + merges.txt "
          f"(vocab {tok.get_vocab_size()})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

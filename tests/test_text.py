"""Text frontend parity tests against the reference symbol inventory."""

import ast
import re

import numpy as np

from efficient_tts_tpu.text import (
    load_phone_vocab,
    phones_to_sequence,
    sequence_to_text,
    text_to_sequence,
)
from efficient_tts_tpu.text.arpabet import VALID_ARPABET
from efficient_tts_tpu.text.numbers_en import normalize_numbers, number_to_words
from efficient_tts_tpu.text.symbols import symbols

REF_CMUDICT = "/root/reference/nntts/text/cmudict.py"
REF_PHNSET = "/root/reference/egs/lj/data/nv_taco2_filelists/g2p_en_phnset.txt"


def test_arpabet_matches_reference_inventory():
    """Parse the reference valid_symbols literal and compare ordering."""
    with open(REF_CMUDICT) as f:
        src = f.read()
    m = re.search(r"valid_symbols = (\[.*?\])", src, re.DOTALL)
    assert m, "reference valid_symbols not found"
    ref = ast.literal_eval(m.group(1))
    assert VALID_ARPABET == ref


def test_symbol_inventory():
    assert len(symbols) == 148
    assert symbols[0] == "_"
    assert symbols[1] == "-"
    assert symbols.index("@AA") == 64
    assert symbols[-1] == "@ZH"
    assert len(set(symbols)) == 148


def test_text_to_sequence_roundtrip():
    seq = text_to_sequence("Hello, world.", ["english_cleaners"])
    assert sequence_to_text(seq) == "hello, world."


def test_arpabet_curly_braces():
    seq = text_to_sequence("Turn {HH AW1 S} left.", ["english_cleaners"])
    text = sequence_to_text(seq)
    assert "{HH}" in text or "HH" in text
    # ids for the three phones present
    assert symbols.index("@HH") in seq
    assert symbols.index("@AW1") in seq
    assert symbols.index("@S") in seq


def test_number_normalization():
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("in 2000") == "in two thousand"
    assert normalize_numbers("in 2008") == "in two thousand eight"
    assert normalize_numbers("in 1900") == "in nineteen hundred"
    assert normalize_numbers("in 1905") == "in nineteen oh five"
    assert normalize_numbers("$5") == "five dollars"
    assert normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert normalize_numbers("3.14") == "three point fourteen"
    assert normalize_numbers("21st") == "twenty-first"
    assert normalize_numbers("100th") == "one hundredth"
    assert normalize_numbers("12,000 men") == "twelve thousand men"
    assert normalize_numbers("£50") == "fifty pounds"


def test_number_to_words_scales():
    assert number_to_words(0) == "zero"
    assert number_to_words(105, andword="") == "one hundred five"
    assert number_to_words(105) == "one hundred and five"
    assert number_to_words(1234567, andword="") == (
        "one million, two hundred thirty-four thousand, five hundred sixty-seven"
    )


def test_phone_vocab_lj():
    vocab = load_phone_vocab(REF_PHNSET)
    assert len(vocab) == 76  # ids 0..75; LJ config num_symbols: 76
    seq = phones_to_sequence("HH AH0 L OW1", vocab)
    assert len(seq) == 4
    assert all(0 <= i < 76 for i in seq)
    # latent reference quirk preserved: phone id 0 collides with pad id 0
    assert min(vocab.values()) == 0


def test_cleaners_ascii():
    seq = text_to_sequence("café", ["transliteration_cleaners"])
    assert sequence_to_text(seq) == "cafe"


def test_sequence_dtype_compat():
    seq = np.asarray(text_to_sequence("abc", ["basic_cleaners"]), dtype=np.int32)
    assert (seq > 0).all()

"""Mandarin front-end tests, incl. vocab coverage against the reference
DataBaker phone inventory."""

from efficient_tts_tpu.text import load_phone_vocab
from efficient_tts_tpu.text.mandarin import (
    parse_pinyin_phn_tone_sep,
    parse_sent,
    split_initial_final,
    split_phone_tone,
)

CN_PHNSET = "/root/reference/egs/lj/local/preprocess_scripts/text/cn_phn_set_from_txdata.txt"


def test_split_phone_tone():
    assert split_phone_tone("ang3") == ["ang", "3"]
    assert split_phone_tone("zh") == ["zh"]
    assert split_phone_tone("a1") == ["a", "1"]
    assert split_phone_tone("er5") == ["er", "5"]


def test_split_initial_final():
    assert split_initial_final("zhang") == ["zh", "ang"]
    assert split_initial_final("an") == ["an"]  # zero initial
    assert split_initial_final("shi") == ["sh", "i"]
    assert split_initial_final("chi") == ["ch", "i"]
    assert split_initial_final("ci") == ["c", "i"]


def test_parse_pinyin_phn_tone_sep():
    assert parse_pinyin_phn_tone_sep("zh-ang3") == ["zh", "ang", "3"]
    assert parse_pinyin_phn_tone_sep("a1") == ["a", "1"]


def test_parse_sent_structure():
    # pronunciation line format: word pos ? punct ... seg_sign pinyin_str
    lines = [
        "word1 n x 0 #1 zh-ang3|d-e5",
        "word2 n x JH #3 h-ao3",
    ]
    out = parse_sent(lines, "PHN_TONE_SEP")
    assert out[0] == "_HEAD"
    assert out[-1] == "_TAIL"
    assert "_SPS_SEG" in out
    assert "zh" in out and "ang" in out and "3" in out
    # final line's trailing punct gets promoted with _E then mapped:
    # _JH -> (after _E promotion) _JH_E stays
    assert any(t.endswith("_E") for t in out)


def test_cn_vocab_loads():
    vocab = load_phone_vocab(CN_PHNSET)
    assert len(vocab) == 112
    # phoneme-level inventory: initials, toned vowel units, prosody pauses,
    # and functional punctuation tokens (corpus-specific final->phoneme
    # decomposition happens upstream of the mounted scripts)
    for tok in ("zh", "sh", "a1", "ng3", "pau#2", "_HEAD", "_JH_E", "_OPUNC"):
        assert tok in vocab

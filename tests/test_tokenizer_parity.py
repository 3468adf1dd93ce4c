"""Tokenizer-ALGORITHM parity against HuggingFace's own implementations.

The public vocab files are not vendorable in this offline environment
(scripts/download_checkpoints.sh fetches them), but transformers IS
installed — so we feed the SAME synthetic vocab/merges to HF's
BertTokenizer / CLIPTokenizer and to ours and assert exact id equality on
arbitrary multi-word captions.  With the real files, identical ids follow.

Parity targets: groundingdino/util/get_tokenlizer.py (AutoTokenizer
bert-base-uncased); diffusers' CLIPTokenizer for SD1.5 prompts.
"""

import json

import numpy as np
import pytest

from inklayer_tpu.models.diffusion.clip_text import CLIPTokenizer, _bytes_to_unicode
from inklayer_tpu.models.gdino.tokenizer import WordPieceTokenizer

CAPTIONS = [
    "object",
    "a red bunny sitting next to the table .",
    "Hello, World! multi-word captions: with punctuation?!",
    "café naïve résumé",  # accents get stripped
    "unknownlongword supercalifragilistic",
    "dog.cat,fish;bird",
    "  extra   whitespace\tand\nnewlines  ",
    "UPPER lower MiXeD",
    "don't it's 2-in-1 co-op",
    "中文 chinese chars",  # CJK spacing
]


@pytest.fixture(scope="module")
def bert_vocab_file(tmp_path_factory):
    """Synthetic WordPiece vocab: specials, single chars, ##-continuations,
    and a few whole words, so greedy longest-match has real choices."""
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    words += ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    words += [str(d) for d in range(10)] + ["##" + str(d) for d in range(10)]
    words += list(".,!?;:'-\"()")
    words += ["object", "red", "bunny", "the", "table", "world", "with",
              "hello", "multi", "##word", "word", "cafe", "naive", "resume",
              "super", "##cal", "##if", "##rag", "chinese", "chars", "dog",
              "cat", "fish", "bird", "don", "##t", "it", "##s", "co", "op",
              "in", "and", "extra", "whitespace", "new", "##lines", "upper",
              "lower", "mixed", "captions", "punctuation", "##tic",
              "中", "文"]
    seen = set()
    uniq = [w for w in words if not (w in seen or seen.add(w))]
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(uniq) + "\n", encoding="utf-8")
    return str(p)


def test_wordpiece_matches_hf(bert_vocab_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=bert_vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_path=bert_vocab_file)
    for cap in CAPTIONS:
        expect = hf(cap)["input_ids"]
        got = ours.encode(cap)
        assert got == expect, (cap, got, expect)


def test_wordpiece_decode_roundtrip(bert_vocab_file):
    ours = WordPieceTokenizer(vocab_path=bert_vocab_file)
    ids = ours.encode("a red bunny")
    assert ours.decode(ids) == "a red bunny"


def test_wordpiece_fallback_warns_once(capsys):
    tok = WordPieceTokenizer()  # embedded fragment
    tok.encode("object")  # in-vocab: silent
    assert "WARNING" not in capsys.readouterr().out
    tok.encode("xylophone zeppelin")
    assert "WARNING" in capsys.readouterr().out
    tok.encode("xylophone again")
    assert "WARNING" not in capsys.readouterr().out  # once only


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    """Synthetic byte-level BPE: full byte alphabet (+</w> forms), specials,
    and a handful of merges so the BPE loop actually merges."""
    base = list(_bytes_to_unicode().values())
    vocab = {}
    for tok in base:
        vocab[tok] = len(vocab)
    for tok in base:
        vocab[tok + "</w>"] = len(vocab)
    merges = ["r e", "re d</w>", "b u", "n n", "bu nn", "bunn y</w>",
              "o b", "j e", "c t</w>", "ob je", "obje ct</w>",
              "t h", "th e</w>", "a </w>".replace(" </w>", "</w>")]
    # drop the malformed last entry; keep well-formed pairs only
    merges = [m for m in merges if len(m.split()) == 2]
    for m in merges:
        a, b = m.split()
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    d = tmp_path_factory.mktemp("clip")
    vp = d / "vocab.json"
    mp = d / "merges.txt"
    vp.write_text(json.dumps(vocab), encoding="utf-8")
    mp.write_text("#version: 0.2\n" + "\n".join(merges) + "\n",
                  encoding="utf-8")
    return str(vp), str(mp)


def test_clip_bpe_matches_hf(clip_files):
    from transformers import CLIPTokenizer as HFCLIPTokenizer

    vp, mp = clip_files
    hf = HFCLIPTokenizer(vocab_file=vp, merges_file=mp)
    ours = CLIPTokenizer(vocab_path=vp, merges_path=mp)
    prompts = [
        "a red bunny",
        "object on the table",
        "high quality black and white line drawing, clean precise lines",
        "UPPER case GETS lowered",
        "numbers 123 and punctuation!?",
    ]
    for p in prompts:
        expect = hf(p)["input_ids"]
        got = ours.encode(p, max_len=77)[0]
        assert list(got[: len(expect)]) == expect, (p, got[:len(expect)], expect)
        assert all(int(t) == ours.eos for t in got[len(expect):])


def test_clip_hash_fallback_warns_once(capsys):
    tok = CLIPTokenizer()
    tok.encode("anything")
    # warning goes to stderr so bench.py stdout stays one JSON line
    assert "WARNING" in capsys.readouterr().err
    tok.encode("more")
    assert "WARNING" not in capsys.readouterr().err
    ids = tok.encode("stable prompt")
    ids2 = CLIPTokenizer().encode("stable prompt")
    np.testing.assert_array_equal(ids, ids2)  # deterministic

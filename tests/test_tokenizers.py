"""CLIP BPE tokenizer vs transformers' own, on a shared synthetic
vocabulary (real vocab files are checkpoint assets; the ALGORITHM is what
is under test).

Parity prompts are ASCII without apostrophes: with ftfy absent (as here),
transformers falls back to a BERT BasicTokenizer that splits contractions
("isn ' t") where the published CLIP regex keeps "'t" joined — ours
follows the published (ftfy-present) behavior, tested separately."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPTokenizer  # noqa: E402

from skrample_tpu.models.tokenizers import CLIPBPETokenizer, _bytes_to_unicode  # noqa: E402

MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "n"),
    ("an", "d</w>"),
    ("c", "a"),
    ("ca", "t</w>"),
    ("h", "a"),
    ("ha", "t</w>"),
    ("i", "n</w>"),
    ("'", "t</w>"),
]


def build_vocab() -> dict[str, int]:
    bu = _bytes_to_unicode()
    vocab: dict[str, int] = {}
    for b in range(256):
        vocab.setdefault(bu[b], len(vocab))
        vocab.setdefault(bu[b] + "</w>", len(vocab))
    for a, b in MERGES:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return vocab


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    (d / "vocab.json").write_text(json.dumps(build_vocab()))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    return d / "vocab.json", d / "merges.txt"


PROMPTS = [
    "The cat AND the   hat!",
    "a cat in the hat, again... 42 cats?",
    "THE-CAT@hat.cat #and",
    "",
    "cat " * 30,  # exercises truncation
]


def test_matches_transformers_on_shared_vocab(files) -> None:
    vocab_json, merges_txt = files
    ours = CLIPBPETokenizer.from_files(vocab_json, merges_txt)
    hf = CLIPTokenizer(str(vocab_json), str(merges_txt), pad_token="<|endoftext|>")
    got = ours(PROMPTS, length=16)
    want = hf(PROMPTS, padding="max_length", max_length=16, truncation=True).input_ids
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_contractions_follow_the_published_regex(files) -> None:
    "'t stays one piece (the ftfy-present canonical path), merged to 't</w>."
    ours = CLIPBPETokenizer.from_files(*files)
    ids = ours.encode("isn't")
    assert ids[-1] == ours.vocab["'t</w>"]
    assert ours.decode(ids) == "isn 't"  # </w> boundaries become spaces


def test_special_token_text_stays_atomic(files) -> None:
    "Literal <|endoftext|> in a prompt is one id, matching transformers."
    vocab_json, merges_txt = files
    ours = CLIPBPETokenizer.from_files(vocab_json, merges_txt)
    hf = CLIPTokenizer(str(vocab_json), str(merges_txt), pad_token="<|endoftext|>")
    text = "the cat <|endoftext|> hat"
    assert ours.encode(text).count(ours.eos_id) == 1
    want = hf(text, padding="max_length", max_length=16, truncation=True).input_ids
    np.testing.assert_array_equal(ours(text, length=16)[0], np.asarray(want, np.int32))


def test_pad_id_override(files) -> None:
    "SDXL's second tokenizer pads with id 0 instead of eos."
    ours = CLIPBPETokenizer.from_files(*files)
    row = ours("cat", length=8, pad_id=0)[0]
    assert row[0] == ours.bos_id and ours.eos_id in row
    assert row[-1] == 0


def test_roundtrip_decode(files) -> None:
    ours = CLIPBPETokenizer.from_files(*files)
    assert ours.decode(ours.encode("the cat and the hat")) == "the cat and the hat"


# ---------------------------------------------------------------------------
# UnigramTokenizer (the T5 family) vs the HF `tokenizers` Unigram model on a
# shared synthetic scored vocabulary.  The oracle carries the same normalizer
# chain we implement (NFKC + control->space + space collapsing) so the pinned
# property is the SEGMENTATION: metaspace word marking, Viterbi, unk fusion.


def unigram_vocab() -> list[tuple[str, float]]:
    pieces = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0), ("▁", -2.0)]
    pieces += [
        ("▁hello", -5.0), ("hel", -4.0), ("lo", -3.5), ("▁w", -4.0), ("orld", -5.0),
        ("or", -4.5), ("ld", -4.5), ("ab", -4.2), ("ba", -4.4), ("▁ab", -3.9),
    ]  # fmt: skip
    for ch in "helowrdab":
        pieces.append((ch, -6.0))
    return pieces


def build_unigram_oracle(vocab, specials=()):
    from tokenizers import AddedToken, Regex, Tokenizer
    from tokenizers import models as tok_models
    from tokenizers import normalizers, pre_tokenizers, processors

    hf = Tokenizer(tok_models.Unigram(vocab, unk_id=2, byte_fallback=False))
    hf.normalizer = normalizers.Sequence(
        [
            normalizers.NFKC(),
            normalizers.Replace(Regex("[\\t\\n\\r\\x0b\\x0c]"), " "),
            normalizers.Replace(Regex(" {2,}"), " "),
        ]
    )
    hf.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="always", split=True)
    hf.add_special_tokens([AddedToken(t, special=True) for t in specials])
    hf.post_processor = processors.TemplateProcessing(single="$A </s>", special_tokens=[("</s>", 1)])
    return hf


def test_unigram_segmentation_matches_tokenizers_fuzz() -> None:
    import random

    from skrample_tpu.models.tokenizers import UnigramTokenizer

    vocab = unigram_vocab()
    hf = build_unigram_oracle(vocab)
    ours = UnigramTokenizer(vocab)
    cases = [
        "hello world", "hello  world", "hexlo", "xhel", "helx", "xx", "",
        "  hello ", "abab", "hello worldorld", "a b ab ba", "héllo", "ﬁd",
        "ｗorld", "newline\nsep", "tab\tsep", "⽇ unknown ⽇⽇ runs",
    ]  # fmt: skip
    rng = random.Random(60)
    alpha = "helowrdab x é⽇"
    cases += ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40))) for _ in range(400)]
    for text in cases:
        want = hf.encode(text).ids[:-1]  # strip the template eos
        assert ours.encode(text) == want, repr(text)


def test_unigram_call_layout_matches_transformers() -> None:
    "eos append + pad-with-0 + truncation, and atomic <extra_id_N> sentinels."
    from transformers import PreTrainedTokenizerFast

    from skrample_tpu.models.tokenizers import UnigramTokenizer

    vocab = unigram_vocab()
    specials = ("<extra_id_0>", "<extra_id_1>")
    hf = build_unigram_oracle(vocab, specials)
    fast = PreTrainedTokenizerFast(tokenizer_object=hf, eos_token="</s>", unk_token="<unk>", pad_token="<pad>")
    base = len(vocab)
    ours = UnigramTokenizer(vocab, specials={t: base + i for i, t in enumerate(specials)})
    prompts = [
        "hello world",
        "fill <extra_id_0> in the <extra_id_1> hole",
        "<extra_id_1>",
        "",
        "hello " * 30,  # truncation
    ]
    want = fast(prompts, max_length=16, padding="max_length", truncation=True)["input_ids"]
    np.testing.assert_array_equal(ours(prompts, length=16), np.asarray(want, np.int32))


def test_unigram_from_tokenizer_json(tmp_path) -> None:
    "Loads the HF-format file: vocab ids, unk/eos/pad, added specials."
    from skrample_tpu.models.tokenizers import UnigramTokenizer

    vocab = unigram_vocab()
    hf = build_unigram_oracle(vocab, ("<extra_id_0>",))
    path = tmp_path / "tokenizer.json"
    hf.save(str(path))
    loaded = UnigramTokenizer.from_tokenizer_json(path)
    assert loaded.eos_id == 1 and loaded.pad_id == 0 and loaded.unk_id == 2
    assert loaded.specials == {"<extra_id_0>": len(vocab)}
    text = "fill <extra_id_0> hello"
    assert loaded.encode(text) == hf.encode(text).ids[:-1]
    with pytest.raises(ValueError, match="Unigram"):
        bad = tmp_path / "bpe.json"
        bad.write_text(json.dumps({"model": {"type": "BPE"}}))
        UnigramTokenizer.from_tokenizer_json(bad)


def test_unigram_roundtrip_decode() -> None:
    from skrample_tpu.models.tokenizers import UnigramTokenizer

    ours = UnigramTokenizer(unigram_vocab())
    assert ours.decode(ours.encode("hello world hello")) == "hello world hello"


def test_unigram_feeds_imported_t5_tower() -> None:
    "Ids flow straight into an imported T5 encoder (vocab sizes aligned)."
    import jax.numpy as jnp
    from transformers import T5Config, T5EncoderModel

    from skrample_tpu.models.import_weights import t5_encoder
    from skrample_tpu.models.tokenizers import UnigramTokenizer

    ours = UnigramTokenizer(unigram_vocab())
    size = len(ours.pieces)
    torch.manual_seed(61)
    hf = T5EncoderModel(
        T5Config(
            vocab_size=size,
            d_model=16,
            d_kv=8,
            d_ff=32,
            num_layers=2,
            num_heads=2,
            relative_attention_num_buckets=8,
            relative_attention_max_distance=16,
            dense_act_fn="relu",
            is_gated_act=False,
        )
    ).eval()
    enc, params = t5_encoder(hf)
    ids = ours(["hello world", "ab world hello ba"], length=12)
    with torch.no_grad():
        want = hf(input_ids=torch.as_tensor(np.asarray(ids, np.int64))).last_hidden_state.numpy()
    got = np.asarray(enc.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_feeds_imported_clip_tower(files) -> None:
    "Ids flow straight into an imported text encoder (vocab sizes aligned)."
    import jax.numpy as jnp
    from transformers import CLIPTextConfig, CLIPTextModel

    from skrample_tpu.models.import_weights import clip_text_encoder

    ours = CLIPBPETokenizer.from_files(*files)
    size = len(ours.vocab)
    torch.manual_seed(60)
    hf = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=size,
            hidden_size=16,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            max_position_embeddings=16,
            eos_token_id=ours.eos_id,
            bos_token_id=ours.bos_id,
            hidden_act="gelu",
        )
    ).eval()
    enc, params = clip_text_encoder(hf)
    ids = ours(["the cat", "a hat and a cat"], length=16)
    with torch.no_grad():
        want = hf(input_ids=torch.as_tensor(np.asarray(ids, np.int64))).last_hidden_state.numpy()
    got = np.asarray(enc.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5)

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

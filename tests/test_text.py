"""Byte-level BPE tokenizer + packed LM dataset (utils/text.py).  No
reference analog (the reference zoo is CNN-only) — this is the text front
end for the transformer families."""

import numpy as np
import pytest

import deepflows_tpu as df
from deepflows_tpu import Graph, nn, optim
from deepflows_tpu.utils.text import BPETokenizer, LMDataset

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
] * 4


@pytest.fixture(autouse=True)
def _clean():
    yield
    Graph.free_graph_all()
    df.set_grad_enabled(True)


def test_bpe_roundtrip_exact():
    tok = BPETokenizer().train(CORPUS, vocab_size=300)
    for t in CORPUS + ["completely unseen text!", "héllo wörld ☃", ""]:
        assert tok.decode(tok.encode(t)) == t


def test_bpe_compresses_and_is_deterministic():
    tok1 = BPETokenizer().train(CORPUS, vocab_size=320)
    tok2 = BPETokenizer().train(CORPUS, vocab_size=320)
    assert tok1.merges == tok2.merges  # tie-break is deterministic
    text = CORPUS[0]
    assert len(tok1.encode(text)) < len(text.encode("utf-8"))  # merges fire
    assert tok1.vocab_size == 320


def test_bpe_specials_and_save_load(tmp_path):
    tok = BPETokenizer().train(CORPUS, vocab_size=280)
    assert tok.eos_id == tok.vocab_size - 1
    assert tok.pad_id == tok.vocab_size - 2
    ids = tok.encode("abc", add_eos=True)
    assert ids[-1] == tok.eos_id
    assert tok.decode(ids) == "abc"  # specials skipped in decode
    p = str(tmp_path / "tok.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges
    assert tok2.encode("the quick") == tok.encode("the quick")


def test_lm_dataset_packs_dense_windows():
    tok = BPETokenizer().train(CORPUS, vocab_size=300)
    ds = LMDataset(CORPUS, tok, seq_len=16)
    assert len(ds) >= 2
    x0, y0 = ds[0]
    x1, y1 = ds[1]
    assert x0.shape == (16,) and y0.shape == (16,)
    np.testing.assert_array_equal(x0[1:], y0[:-1])  # shifted targets
    assert y0[-1] == x1[0]  # windows tile the stream with no gaps
    # eos separators present in the stream
    assert (ds.tokens == tok.eos_id).sum() >= len(CORPUS) - 1


def test_lm_trains_on_tokenized_text():
    """End-to-end: BPE corpus -> packed windows -> TransformerLM through
    the compiled step; loss must drop well below the uniform floor."""
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledTrainStep

    tok = BPETokenizer().train(CORPUS, vocab_size=280)
    ds = LMDataset(CORPUS * 4, tok, seq_len=16)
    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=tok.vocab_size, max_len=16, dim=64,
                              depth=2, num_heads=2, device="tpu")
    opt = optim.Adam(lm.parameters(), lr=3e-3)
    step = CompiledTrainStep(lm, opt, nn.CrossEntropyLoss())
    idx = np.arange(len(ds))
    rng = np.random.default_rng(0)
    loss = None
    for epoch in range(30):
        rng.shuffle(idx)
        xs = np.stack([ds[i][0] for i in idx])
        ys = np.stack([ds[i][1] for i in idx])
        loss = float(step(xs, ys))
    assert loss < 0.5 * np.log(tok.vocab_size), loss


def test_sft_dataset_masks_prompt():
    """SFTDataset: labels carry next-token targets only over the response
    span; prompt and padding are ignore_index — pairs with
    CrossEntropyLoss(ignore_index=) for response-only training."""
    from deepflows_tpu.utils.text import SFTDataset

    tok = BPETokenizer().train(CORPUS, vocab_size=280)
    pairs = [("what is a fox?", " a quick brown animal"),
             ("what jumps?", " the fox jumps")]
    ds = SFTDataset(pairs, tok, seq_len=32)
    assert len(ds) == 2
    x, y = ds[0]
    assert x.shape == (32,) and y.shape == (32,)
    p_ids = tok.encode(pairs[0][0])
    full = p_ids + tok.encode(pairs[0][1]) + [tok.eos_id]
    # prompt positions (before len(p)-1) are masked
    assert (y[: len(p_ids) - 1] == -100).all()
    # response span: labels equal the shifted input
    n = len(full) - 1
    np.testing.assert_array_equal(y[len(p_ids) - 1 : n],
                                  full[len(p_ids) : n + 1])
    # padding masked
    assert (y[n:] == -100).all()
    assert y[n - 1] == tok.eos_id  # last supervised target is eos


def test_sft_dataset_trains_response_only():
    """End-to-end: SFT batch through CompiledTrainStep with
    ignore_index loss; the supervised loss falls."""
    from deepflows_tpu import models
    from deepflows_tpu.jit import CompiledTrainStep
    from deepflows_tpu.utils.text import SFTDataset

    tok = BPETokenizer().train(CORPUS, vocab_size=280)
    pairs = [("Q: color of fox? A:", " brown"),
             ("Q: speed of fox? A:", " quick"),
             ("Q: dog state? A:", " lazy")] * 4
    ds = SFTDataset(pairs, tok, seq_len=16)
    df.manual_seed(0)
    lm = models.TransformerLM(vocab_size=tok.vocab_size, max_len=16, dim=48,
                              depth=2, num_heads=2, device="tpu")
    opt = optim.Adam(lm.parameters(), lr=3e-3)
    step = CompiledTrainStep(
        lm, opt, nn.CrossEntropyLoss(ignore_index=-100)
    )
    xs = ds.inputs
    ys = ds.labels
    first = float(step(xs, ys))
    for _ in range(40):
        last = float(step(xs, ys))
    assert last < 0.2 * first, (first, last)

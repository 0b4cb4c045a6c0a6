"""TransformersBackend.generate exercised end-to-end (VERDICT r3 item 4).

The template renderer and sampling params were already pinned
(tests/test_server.py), but the generate path itself — tokenize the
Llama-2 chat prompt, sample with the reference's params (temperature 5,
top_k 60, top_p 1, 30 new tokens — promptgen.py:25-56), decode, trim —
had never executed because no causal LM is cached in this image.  This
builds a TINY random GPT-2-architecture LM + byte-level tokenizer
in-repo (HF layout, ~100 kB) so the real backend code path runs in CI.
"""

from __future__ import annotations

import json

import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_lm_dir(tmp_path_factory):
    """A minimal random GPT2LMHeadModel + byte-level tokenizer, HF layout."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("tiny_lm")
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u.values())}
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    (d / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "GPT2Tokenizer",
                "eos_token": "<|endoftext|>",
                "bos_token": "<|endoftext|>",
                "unk_token": "<|endoftext|>",
            }
        )
    )
    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=len(vocab),
        # byte-level tokens: the rendered chat prompt alone is ~800 tokens
        n_positions=2048,
        n_embd=32,
        n_layer=2,
        n_head=2,
    )
    GPT2LMHeadModel(cfg).save_pretrained(d)
    return str(d)


def test_generate_runs_reference_chain(tiny_lm_dir):
    from videosd_tpu.promptgen.app import SAMPLING, TransformersBackend

    backend = TransformersBackend(tiny_lm_dir)
    # the backend renders the reference's exact chain shape
    prompt = backend.build_prompt("A cat on a skateboard")
    assert "[INST]" in prompt and "<<SYS>>" in prompt
    assert "A cat on a skateboard" in prompt

    out = backend.generate("A cat on a skateboard", seed=0)
    # random weights produce arbitrary byte-level text; the contract is:
    # sampled through the real generate path, decoded, first-line trimmed
    assert isinstance(out, str)
    assert "\n" not in out
    # 30 new byte-level tokens decode to at most 30 chars (pre-trim)
    assert len(out) <= SAMPLING["max_new_tokens"] * 4

    # determinism contract: same seed -> same sample, fresh seed differs
    assert backend.generate("A cat on a skateboard", seed=0) == out


def test_generate_through_langserve_surface(tiny_lm_dir):
    """The full wire path: POST /llama-chat/invoke -> TransformersBackend."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from videosd_tpu.promptgen.app import TransformersBackend, create_app

    async def run():
        app = create_app(TransformersBackend(tiny_lm_dir))
        async with TestClient(TestServer(app)) as client:
            resp = await client.post(
                "/llama-chat/invoke", json={"input": {"text": "A landscape"}}
            )
            assert resp.status == 200
            body = await resp.json()
            assert isinstance(body["output"]["text"], str)

    asyncio.run(run())

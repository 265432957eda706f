"""HF checkpoint ingestion: gold parity against the actual HF torch models.

For every quantizable family (models/hf_loader.py), build the real
HuggingFace model from a tiny config (offline, random init), save its
``state_dict`` as a checkpoint directory, ingest it through our loader,
and compare FP32 forward logits against the torch model. A transpose or
misrouted tensor anywhere in the mapping fails these tests.

(reference: utils/hf_models.py:52-116 loads live HF modules; we ingest
checkpoint files — SURVEY.md §7 stage 3.)
"""

import json

import numpy as np
import pytest
import torch

from transformer_quantization_tpu.models.registry import get_family

torch.manual_seed(0)

NUM_LABELS = 3
B, T = 2, 12


def _hf_case(family):
    import transformers as tr

    if family == "bert":
        cfg = tr.BertConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, num_labels=NUM_LABELS)
        return cfg, tr.BertForSequenceClassification(cfg)
    if family == "roberta":
        cfg = tr.RobertaConfig(
            vocab_size=130, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
            num_labels=NUM_LABELS)
        return cfg, tr.RobertaForSequenceClassification(cfg)
    if family == "mobilebert":
        cfg = tr.MobileBertConfig(
            vocab_size=128, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48, embedding_size=16,
            intra_bottleneck_size=16, num_feedforward_networks=2,
            max_position_embeddings=64, num_labels=NUM_LABELS)
        return cfg, tr.MobileBertForSequenceClassification(cfg)
    if family == "distilbert":
        cfg = tr.DistilBertConfig(
            vocab_size=128, dim=32, n_layers=2, n_heads=2, hidden_dim=64,
            max_position_embeddings=64, num_labels=NUM_LABELS)
        return cfg, tr.DistilBertForSequenceClassification(cfg)
    if family == "albert":
        cfg = tr.AlbertConfig(
            vocab_size=128, embedding_size=16, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, max_position_embeddings=64,
            num_labels=NUM_LABELS)
        return cfg, tr.AlbertForSequenceClassification(cfg)
    if family == "squeezebert":
        cfg = tr.SqueezeBertConfig(
            vocab_size=128, hidden_size=32, embedding_size=32,
            num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, q_groups=2, k_groups=2, v_groups=2,
            post_attention_groups=1, intermediate_groups=2, output_groups=2,
            num_labels=NUM_LABELS)
        return cfg, tr.SqueezeBertForSequenceClassification(cfg)
    raise ValueError(family)


def _save_checkpoint(tmp_path, hf_cfg, model):
    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "config.json").write_text(hf_cfg.to_json_string())
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    return str(d)


def _inputs(family):
    rng = np.random.RandomState(3)
    # ids >= 3 so no accidental pad tokens; row 1 padded from position 8
    # (RoBERTa derives positions from non-pad ids — HF from input_ids,
    #  ours from the attention mask; pads must carry the pad token id)
    ids = rng.randint(3, 120, (B, T))
    mask = np.ones((B, T), np.float32)
    mask[1, 8:] = 0.0
    ids[1, 8:] = 1
    batch = {"input_ids": ids.astype(np.int32), "attention_mask": mask}
    if family not in ("distilbert", "roberta"):
        batch["token_type_ids"] = np.zeros((B, T), np.int32)
    return batch


@pytest.mark.parametrize("family", ["bert", "roberta", "mobilebert",
                                    "distilbert", "albert", "squeezebert"])
def test_loader_forward_matches_hf(family, tmp_path):
    hf_cfg, model = _hf_case(family)
    model.eval()
    path = _save_checkpoint(tmp_path, hf_cfg, model)

    fam = get_family(family)
    cfg, params = fam.load_checkpoint(path, NUM_LABELS)
    batch = _inputs(family)

    with torch.no_grad():
        tin = {k: torch.tensor(np.asarray(v, np.int64 if k != "attention_mask"
                                          else np.float32))
               for k, v in batch.items()}
        ref = model(**tin).logits.numpy()

    import jax.numpy as jnp

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    out, _ = fam.apply(params, jbatch, cfg=cfg)
    got = np.asarray(out["logits"])
    assert got.shape == ref.shape == (B, NUM_LABELS)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_bert_state_dict_tensor_routing(tmp_path):
    """Spot-check exact tensor identity (not just function parity)."""
    hf_cfg, model = _hf_case("bert")
    path = _save_checkpoint(tmp_path, hf_cfg, model)
    fam = get_family("bert")
    cfg, params = fam.load_checkpoint(path, NUM_LABELS)
    sd = model.state_dict()
    np.testing.assert_array_equal(
        np.asarray(params["layers"][1]["ffn"]["inter"]["kernel"]),
        sd["bert.encoder.layer.1.intermediate.dense.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["embeddings"]["word"]),
        sd["bert.embeddings.word_embeddings.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["classifier"]["bias"]),
        sd["classifier.bias"].numpy())
    # kernel orientation is (out, in) — torch convention
    assert params["layers"][0]["ffn"]["inter"]["kernel"].shape == (64, 32)


def test_loader_reads_safetensors(tmp_path):
    hf_cfg, model = _hf_case("bert")
    d = tmp_path / "st"
    d.mkdir()
    (d / "config.json").write_text(hf_cfg.to_json_string())
    try:
        from safetensors.torch import save_file
    except ImportError:
        pytest.skip("safetensors not installed")
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              str(d / "model.safetensors"))
    fam = get_family("bert")
    cfg, params = fam.load_checkpoint(str(d), NUM_LABELS)
    assert params["embeddings"]["word"].shape == (128, 32)


def test_num_labels_from_config(tmp_path):
    hf_cfg, model = _hf_case("bert")
    hf_cfg.id2label = {0: "a", 1: "b", 2: "c"}
    path = _save_checkpoint(tmp_path, hf_cfg, model)
    from transformer_quantization_tpu.models.hf_loader import load_bert_config

    cfg = load_bert_config(path)
    assert cfg.num_labels == 3


def test_resolve_model_dir_local_and_guidance(tmp_path):
    from transformer_quantization_tpu.models.hf_loader import (
        resolve_model_dir,
    )

    d = str(tmp_path / "ck")
    import os
    os.makedirs(d)
    assert resolve_model_dir(d) == d
    with pytest.raises(FileNotFoundError, match="--from-hub"):
        resolve_model_dir("org/some-model")


def test_resolve_model_dir_hub(monkeypatch, tmp_path):
    """--from-hub routes through huggingface_hub.snapshot_download (the
    reference's by-name zoo, utils/hf_models.py:52-75); mocked here —
    this environment has zero egress."""
    import huggingface_hub

    calls = {}

    def fake_snapshot_download(repo_id, revision=None, allow_patterns=None,
                               cache_dir=None):
        calls["repo_id"] = repo_id
        calls["allow_patterns"] = allow_patterns
        calls["cache_dir"] = cache_dir
        return str(tmp_path / "hubcache")

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        fake_snapshot_download)
    from transformer_quantization_tpu.models.hf_loader import (
        resolve_model_dir,
    )

    out = resolve_model_dir("textattack/bert-base-uncased-RTE",
                            allow_hub=True, cache_dir="/tmp/hfc")
    assert out == str(tmp_path / "hubcache")
    assert calls["repo_id"] == "textattack/bert-base-uncased-RTE"
    assert "config.json" in calls["allow_patterns"]
    assert calls["cache_dir"] == "/tmp/hfc"

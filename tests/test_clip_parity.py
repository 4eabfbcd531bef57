"""Executed parity: Flax CLIP towers vs torch ``transformers.CLIPModel``.

The reference's entire quality story flows through HF CLIP features
(``CLIPModel.get_image_features``, retrieval.ipynb cell 2 /
src/train.py:2459-2464).  These tests build a RANDOM-INIT torch ``CLIPModel``
in-process (no network), round-trip it through ``save_pretrained`` → the
framework's weight converters, and assert the Flax towers reproduce torch's
features — so any divergence in pre_layrnorm placement, attention scaling,
quick-gelu, EOS pooling, or the weight transposition is caught here rather
than silently degrading recall on a real checkpoint.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

from patent_tpu.models.vit import (
    TEXT_B,
    VIT_B16,
    TextConfig,
    TextTransformer,
    VisionConfig,
    VisionTransformer,
    hf_clip_text_params,
    hf_clip_vision_params,
    load_hf_clip_params,
    load_hf_clip_text_params,
)

SMALL_VISION = VisionConfig(image_size=32, patch_size=8, hidden_dim=64,
                            num_layers=2, num_heads=4, mlp_dim=128,
                            projection_dim=32)
SMALL_TEXT = TextConfig(vocab_size=128, context_length=16, hidden_dim=64,
                        num_layers=2, num_heads=4, mlp_dim=128,
                        projection_dim=32)


def _small_torch_clip() -> CLIPModel:
    cfg = CLIPConfig(
        vision_config=CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            projection_dim=32).to_dict(),
        text_config=CLIPTextConfig(
            vocab_size=128, max_position_embeddings=16, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
            projection_dim=32, eos_token_id=127, bos_token_id=126,
            pad_token_id=0).to_dict(),
        projection_dim=32)
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    model.eval()
    return model


def _state_dict_np(model) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _token_batch(vocab_size: int, length: int, batch: int,
                 eos_id: int) -> np.ndarray:
    """Random token rows: BOS-ish start, EOS (= the vocab max id) at a
    varying position, pad after — EOS is both conventions' pooling anchor
    (argmax-of-ids == first-eos when eos is the max id, as in real CLIP)."""
    rng = np.random.default_rng(0)
    ids = rng.integers(1, eos_id - 1, size=(batch, length))
    for row in range(batch):
        eos_pos = 3 + row % (length - 3)
        ids[row, eos_pos] = eos_id
        ids[row, eos_pos + 1:] = 0
    return ids.astype(np.int32)


def test_vision_tower_matches_torch_get_image_features(tmp_path):
    model = _small_torch_clip()
    model.save_pretrained(tmp_path)  # exercises the real from_pretrained path
    params = load_hf_clip_params(str(tmp_path), SMALL_VISION)

    rng = np.random.default_rng(1)
    images = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(VisionTransformer(SMALL_VISION).apply(
        {"params": params}, jnp.asarray(images)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_int8_quantized_converted_weights_match_torch(tmp_path):
    """The int8 PTQ serving tower, fed CONVERTED HF CLIP weights, stays
    close to torch's features (the --quantize production path end-to-end:
    torch checkpoint → converter → quantize_vit_params → Int8 tower)."""
    from patent_tpu.models.vit_int8 import (Int8VisionTransformer,
                                            quantize_vit_params)

    model = _small_torch_clip()
    model.save_pretrained(tmp_path)
    params = load_hf_clip_params(str(tmp_path), SMALL_VISION)
    qp = quantize_vit_params(params)

    rng = np.random.default_rng(1)
    images = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(Int8VisionTransformer(SMALL_VISION, dtype=jnp.float32)
                     .apply({"params": qp}, jnp.asarray(images)))
    cos = np.sum(got * want, -1) / (np.linalg.norm(got, axis=-1)
                                    * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.99, f"int8 vs torch cosine too low: {cos}"


def test_text_tower_matches_torch_get_text_features(tmp_path):
    model = _small_torch_clip()
    model.save_pretrained(tmp_path)
    params = load_hf_clip_text_params(str(tmp_path), SMALL_TEXT)

    ids = _token_batch(128, 16, batch=5, eos_id=127)
    with torch.no_grad():
        want = model.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64))).numpy()
    got = np.asarray(TextTransformer(SMALL_TEXT).apply(
        {"params": params}, jnp.asarray(ids)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_vision_export_roundtrip_to_torch(tmp_path):
    """Flax → HF state-dict export loads back into torch and reproduces the
    Flax features (the save_pretrained hand-off direction the reference's
    fine-tune → serving pipeline depends on)."""
    from patent_tpu.models.vit import hf_clip_vision_state_dict

    # a torch model gives a valid config shell; REPLACE its weights with a
    # fresh random-init Flax tower, export, and compare
    model = _small_torch_clip()
    flax_model = VisionTransformer(SMALL_VISION)
    params = flax_model.init(
        __import__("jax").random.key(7),
        jnp.zeros((1, 32, 32, 3)))["params"]
    sd = hf_clip_vision_state_dict(params, SMALL_VISION)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert not unexpected
    assert all(k.startswith("text_model") or k == "text_projection.weight"
               or "logit_scale" in k for k in missing), missing
    model.eval()

    rng = np.random.default_rng(2)
    images = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(flax_model.apply({"params": params},
                                      jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_eos_pooling_position_matters():
    """Moving the EOS token changes the pooled feature (i.e. pooling really
    anchors at EOS, not at a fixed position)."""
    model = _small_torch_clip()
    params = hf_clip_text_params(_state_dict_np(model), SMALL_TEXT)
    ids = _token_batch(128, 16, batch=1, eos_id=127)
    moved = ids.copy()
    eos_pos = int(np.argmax(ids[0]))
    moved[0, eos_pos] = 5
    moved[0, eos_pos + 2 if eos_pos + 2 < 16 else eos_pos - 1] = 127
    tower = TextTransformer(SMALL_TEXT)
    a = np.asarray(tower.apply({"params": params}, jnp.asarray(ids)))
    b = np.asarray(tower.apply({"params": params}, jnp.asarray(moved)))
    assert np.abs(a - b).max() > 1e-3


@pytest.mark.slow
def test_vit_b16_full_size_parity(tmp_path):
    """Full ViT-B/16 (the deployment config): random-init torch CLIP vs the
    Flax tower at 224×224 — catches config-scale-specific divergence."""
    cfg = CLIPConfig(
        vision_config=CLIPVisionConfig(patch_size=16).to_dict(),
        text_config=CLIPTextConfig().to_dict())
    torch.manual_seed(0)
    model = CLIPModel(cfg)
    model.eval()
    params = hf_clip_vision_params(_state_dict_np(model), VIT_B16)

    rng = np.random.default_rng(2)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(VisionTransformer(VIT_B16).apply(
        {"params": params}, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)

    # text tower at full size too (vocab 49408, 12 layers)
    text_params = hf_clip_text_params(_state_dict_np(model), TEXT_B)
    ids = _token_batch(49408, 77, batch=2, eos_id=49407)
    with torch.no_grad():
        want_t = model.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64))).numpy()
    got_t = np.asarray(TextTransformer(TEXT_B).apply(
        {"params": text_params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got_t, want_t, atol=5e-4, rtol=0)

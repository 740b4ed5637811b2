"""Transformer recognizer tests (small config)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_tr():
    from vtd_tpu.models.trocr import small_config
    from vtd_tpu.runtime.trocr_runtime import TransformerRecognizer

    return TransformerRecognizer(config=None or small_config(), pad_batch=4)


def test_char_tokenizer_roundtrip():
    from vtd_tpu.models.trocr import CharTokenizer

    tok = CharTokenizer()
    ids = tok.encode("Hello, World! 123")
    assert ids[0] == tok.BOS and ids[-1] == tok.EOS
    assert tok.decode(ids[1:]) == "Hello, World! 123"


def test_trocr_training_forward_shape():
    import jax
    import jax.numpy as jnp
    from vtd_tpu.models.trocr import TrOCR, small_config

    cfg = small_config()
    model = TrOCR(cfg)
    imgs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    toks = jnp.zeros((2, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), imgs, toks)
    logits = model.apply(variables, imgs, toks)
    assert logits.shape == (2, 5, cfg.vocab_size)


def test_trocr_greedy_generate_shapes(small_tr):
    import jax.numpy as jnp
    from vtd_tpu.models.trocr import greedy_generate

    cfg = small_tr.cfg
    imgs = jnp.zeros((3, cfg.image_size, cfg.image_size, 3), jnp.float32)
    toks, conf = greedy_generate(small_tr.model, small_tr.variables, imgs)
    assert toks.shape == (3, cfg.max_len)
    assert conf.shape == (3,)
    assert np.all((np.asarray(conf) >= 0) & (np.asarray(conf) <= 1))


def test_transformer_recognizer_batch_api(small_tr, rng):
    crops = [
        rng.integers(0, 255, (40, 200, 3), np.uint8),
        rng.integers(0, 255, (64, 64), np.uint8),  # grayscale input
    ]
    out = small_tr.recognize_batch(crops)
    assert len(out) == 2
    for r in out:
        assert set(r) == {"text", "confidence"}
        assert isinstance(r["text"], str)
        assert 0.0 <= r["confidence"] <= 1.0


def test_transformer_decode_consistency(small_tr, rng):
    """Same crop twice in a batch -> identical transcript."""
    crop = rng.integers(0, 255, (32, 100, 3), np.uint8)
    out = small_tr.recognize_batch([crop, crop])
    assert out[0]["text"] == out[1]["text"]


def test_rectangular_input():
    """image_width != image_size: text-shaped encoder input. The ViT is
    shape-agnostic; num_patches and the runtime prep must follow."""
    import jax
    import jax.numpy as jnp
    from vtd_tpu.models.trocr import TrOCR, small_config

    cfg = small_config(image_size=32, image_width=128, patch_size=16)
    assert cfg.num_patches == 2 * 8 + 1
    model = TrOCR(cfg)
    img = jnp.zeros((2, 32, 128, 3), jnp.float32)
    tok = jnp.zeros((2, 4), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, tok)
    logits = model.apply(variables, img, tok)
    assert logits.shape == (2, 4, cfg.vocab_size)

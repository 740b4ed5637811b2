"""HF TrOCR (VisionEncoderDecoder) weight-import numerical parity.

Builds a *real* HF VisionEncoderDecoderModel (tiny dims, random init —
no hub download) with transformers, imports its state dict through
``import_trocr_state``, and checks teacher-forced logits match between
the torch graph and the flax TrOCR in HF-compat mode. This is the same
proof pattern as the CRNN import parity test (test_import_torch.py):
if tiny random weights agree to float tolerance, the mapping is exact
for trained checkpoints of the same layout (reference loads TrOCR this
way: app/ml/models/text_recognizer.py:39-69).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VOCAB = 53
MAX_LEN = 12


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (
        TrOCRConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    enc = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    dec = TrOCRConfig(
        d_model=32, decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=64, vocab_size=VOCAB, max_position_embeddings=64,
        scale_embedding=False, activation_function="gelu",
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        layernorm_embedding=True, use_learned_position_embeddings=True,
        decoder_start_token_id=1, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc, dec)
    torch.manual_seed(0)
    model = VisionEncoderDecoderModel(config=cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_pair(hf_model):
    from vtd_tpu.models.import_torch import import_trocr_state
    from vtd_tpu.models.trocr import TrOCR, hf_config

    cfg = hf_config(
        vocab_size=VOCAB, image_size=32, patch_size=16,
        enc_dim=32, enc_layers=2, enc_heads=4, enc_mlp=64,
        dec_dim=32, dec_layers=2, dec_heads=4, dec_mlp=64,
        max_len=MAX_LEN,
    )
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    variables = import_trocr_state(sd, cfg)
    return TrOCR(cfg), variables


def test_teacher_forced_logits_parity(hf_model, flax_pair):
    model, variables = flax_pair
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(0, VOCAB, (2, 7)).astype(np.int32)

    with torch.no_grad():
        ref = hf_model(
            pixel_values=torch.from_numpy(
                np.transpose(images, (0, 3, 1, 2))
            ),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()

    import jax

    ours = np.asarray(
        jax.jit(model.apply)(variables, images, tokens), np.float32
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_greedy_decode_parity(hf_model, flax_pair):
    """KV-cached batched greedy decode == HF generate (greedy)."""
    from vtd_tpu.models.trocr import greedy_generate

    model, variables = flax_pair
    rng = np.random.default_rng(1)
    images = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model.generate(
            pixel_values=torch.from_numpy(
                np.transpose(images, (0, 3, 1, 2))
            ),
            max_length=MAX_LEN + 1,  # + start token
            num_beams=1, do_sample=False,
        ).numpy()

    toks, conf = greedy_generate(
        model, variables, images, bos_id=1, eos_id=2
    )
    toks = np.asarray(toks)
    assert conf.shape == (3,)
    for b in range(3):
        ref_row = [t for t in ref[b][1:]]  # drop decoder_start
        our_row = list(toks[b])
        for r, o in zip(ref_row, our_row):
            assert r == o, (b, ref_row, our_row)
            if r == 2:  # eos — rest is padding in both
                break


def test_import_trocr_pth_roundtrip(tmp_path, hf_model):
    """.pth file path: save the torch state dict, load via importer."""
    from vtd_tpu.models.import_torch import import_trocr_pth
    from vtd_tpu.models.trocr import hf_config

    cfg = hf_config(
        vocab_size=VOCAB, image_size=32, patch_size=16,
        enc_dim=32, enc_layers=2, enc_heads=4, enc_mlp=64,
        dec_dim=32, dec_layers=2, dec_heads=4, dec_mlp=64,
        max_len=MAX_LEN,
    )
    p = str(tmp_path / "trocr.pth")
    torch.save({"model_state_dict": hf_model.state_dict()}, p)
    variables = import_trocr_pth(p, cfg)
    assert variables["params"]["decoder"]["lm_head"]["kernel"].shape == (
        32, VOCAB,
    )

"""Native C++ CTC beam decoder tests (builds the .so, checks parity
with the Python oracle and greedy decode on easy inputs)."""
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    from vtd_tpu import native as n

    assert n.build() is not None, "g++ build failed"
    assert n.native_available()
    return n


def _log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_beam_matches_python_oracle(native):
    rng = np.random.default_rng(0)
    lp = _log_softmax(rng.normal(size=(4, 12, 20)).astype(np.float32) * 2)
    c_seqs, c_scores = native.ctc_beam_decode(lp, beam_width=6)
    p_seqs, p_scores = native._py_beam_batch(lp, 6, 0, 64)
    assert c_seqs == p_seqs
    np.testing.assert_allclose(c_scores, p_scores, atol=1e-4)


def test_beam_recovers_obvious_sequence(native):
    # construct logits spelling ids [5, 5, 0, 7] -> sequence [5, 7]
    V, T = 10, 6
    lp = np.full((1, T, V), -10.0, np.float32)
    for t, s in enumerate([5, 5, 0, 7, 0, 0]):
        lp[0, t, s] = 0.0
    seqs, scores = native.ctc_beam_decode(lp, beam_width=4)
    assert seqs[0] == [5, 7]
    assert scores[0] > -1.0


def test_beam_multithreaded_consistency(native):
    rng = np.random.default_rng(1)
    lp = _log_softmax(rng.normal(size=(16, 31, 97)).astype(np.float32))
    s1, _ = native.ctc_beam_decode(lp, beam_width=8, n_threads=1)
    s4, _ = native.ctc_beam_decode(lp, beam_width=8, n_threads=4)
    assert s1 == s4


def test_beam_speed_vs_python(native):
    rng = np.random.default_rng(2)
    lp = _log_softmax(rng.normal(size=(32, 31, 97)).astype(np.float32))
    t0 = time.time()
    native.ctc_beam_decode(lp, beam_width=8, n_threads=1)
    c_time = time.time() - t0
    t0 = time.time()
    native._py_beam_batch(lp, 8, 0, 64)
    p_time = time.time() - t0
    assert c_time < p_time, (c_time, p_time)

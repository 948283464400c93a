"""Explainability tests: grad extraction correctness, CTV math, gradcam."""

import numpy as np
import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.models.timesformer import (
    TimeSformer, TimeSformerConfig)
from cross_modal_video_engine_tpu.models.recognizer import Recognizer3D
from cross_modal_video_engine_tpu.explain import (
    grad_extract, build_instance_ctvs, concept_scores,
    cluster_concept_vectors, symbolic_concept_vectors, tcav_statistics,
    top_concepts, concept_robustness, gradcam_from_tokens,
    linear_probe_concepts, ResidualHead, ConceptBottleneckConfig)
from cross_modal_video_engine_tpu.explain.grads import normalized_cls_grad

rng = np.random.default_rng(41)
TS = TimeSformerConfig(num_frames=2, img_size=16, patch_size=8,
                       embed_dims=16, num_heads=2, num_layers=3,
                       drop_path_max=0.0)


def _setup():
    model = Recognizer3D(TS, num_classes=5)
    v = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), v)
    return model, variables, v


def test_capture_matches_full_forward():
    model, variables, v = _setup()
    scores_full = np.asarray(model.apply(variables, v))
    scores_cap, captured = model.apply(variables, v, (1,),
                                       method="forward_with_capture")
    np.testing.assert_allclose(np.asarray(scores_cap), scores_full,
                               rtol=1e-5, atol=1e-6)
    P, T = TS.num_patches, TS.num_frames
    assert captured[1].shape == (2, 1 + P * T, TS.embed_dims)
    # resuming from the captured layer reproduces the scores
    scores_resume = model.apply(variables, captured[1], 1,
                                method="score_from_layer")
    np.testing.assert_allclose(np.asarray(scores_resume), scores_full,
                               rtol=1e-4, atol=1e-5)


def test_grad_extract_matches_finite_difference():
    model, variables, v = _setup()
    out = grad_extract(model, variables, v, layers=[1], jit=False)
    g = out["gradients"][1]
    act = out["activations"][1]
    assert g.shape == act.shape
    # finite-difference check on one coordinate
    eps = 1e-3
    cls_idx = out["pred"]
    act_p = act.copy()
    act_p[0, 0, 0] += eps
    s_p = np.asarray(model.apply(variables, jnp.asarray(act_p), 1,
                                 method="score_from_layer"))
    act_m = act.copy()
    act_m[0, 0, 0] -= eps
    s_m = np.asarray(model.apply(variables, jnp.asarray(act_m), 1,
                                 method="score_from_layer"))
    fd = (s_p[0, cls_idx[0]] - s_m[0, cls_idx[0]]) / (2 * eps)
    np.testing.assert_allclose(g[0, 0, 0], fd, rtol=5e-2, atol=1e-3)


def test_instance_ctvs_batched():
    model, variables, v = _setup()

    def embed(stack):
        feat, cap = model.apply(variables, jnp.asarray(stack), (2,),
                                method="forward_with_capture")
        return np.asarray(cap[2][:, 0])      # CLS at layer 2

    raw = np.asarray(v[0])
    masked = {"dog": raw * 0.5, "cat": raw * 0.0}
    ctvs = build_instance_ctvs(embed, raw, masked)
    assert set(ctvs) == {"dog", "cat"}
    # definitional check: raw_emb - masked_emb
    raw_e = embed(raw[None])[0]
    dog_e = embed((raw * 0.5)[None])[0]
    np.testing.assert_allclose(ctvs["dog"], raw_e - dog_e, rtol=1e-3,
                               atol=1e-4)


def test_concept_levels_and_scores():
    D = 8
    inst = {
        "dog": [rng.standard_normal(D) + 5 for _ in range(4)],
        "cat": [rng.standard_normal(D) - 5 for _ in range(5)],
    }
    sym, names = symbolic_concept_vectors(inst)
    assert sym.shape == (2, D) and names == ["cat", "dog"]
    np.testing.assert_allclose(sym[names.index("dog")],
                               np.mean(np.stack(inst["dog"]), 0))
    clus, cnames = cluster_concept_vectors(inst, n_clusters=2)
    assert clus.shape[0] == 4          # 2 concepts x 2 clusters
    grad = rng.standard_normal(D)
    s = concept_scores(sym, grad)
    np.testing.assert_allclose(s, sym @ grad)
    top = top_concepts(s, names, k=1)
    assert top[0][0] == names[int(np.argmax(s))]


def test_tcav_and_robustness():
    names = ["a", "b"]
    per_cls = {"run": [np.array([2.0, 0.0]), np.array([0.0, 2.0])],
               "swim": [np.array([0.0, 4.0])]}
    stats = tcav_statistics(per_cls, names)
    np.testing.assert_allclose(stats["run"]["a"], 0.5)
    np.testing.assert_allclose(stats["swim"]["b"], 1.0)
    rob = concept_robustness({"stable": [np.ones(4), np.ones(4) * 2],
                              "noisy": [np.array([1, 0, 0, 0.]),
                                        np.array([0, 1, 0, 0.])]})
    assert rob["stable"] > 0.99 and rob["noisy"] < 0.1


def test_gradcam_shape_and_range():
    B, T, g, D = 2, 2, 2, 16
    P = g * g
    act = rng.standard_normal((B, 1 + P * T, D)).astype(np.float32)
    grad = rng.standard_normal((B, 1 + P * T, D)).astype(np.float32)
    cam = gradcam_from_tokens(act, grad, T, g)
    assert cam.shape == (B, T, g, g)
    assert cam.min() >= 0 and cam.max() <= 1 + 1e-6


def test_normalized_cls_grad():
    g = rng.standard_normal((3, 9, 8)).astype(np.float32)
    v = normalized_cls_grad(g)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)


def test_linear_probe():
    D, N = 6, 120
    emb = rng.standard_normal((N, D))
    y = (emb[:, 0] > 0).astype(int)         # perfectly probe-able concept
    noise = rng.integers(0, 2, N)           # unlearnable concept
    auc = linear_probe_concepts(emb, {"signal": y, "noise": noise})
    assert auc["signal"] > 0.9
    assert 0.2 < auc["noise"] < 0.8


def test_residual_head():
    cfg = ConceptBottleneckConfig(embed_dim=8, n_concepts=4, num_classes=3,
                                  hidden=6)
    head = ResidualHead(cfg)
    e = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    variables = head.init(jax.random.key(0), e, c)
    logits, concept_logits = head.apply(variables, e, c)
    assert logits.shape == (2, 3) and concept_logits.shape == (2, 3)

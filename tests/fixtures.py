"""Tiny on-disk dataset fixtures in the reference layout."""

import os

import jax
import numpy as np

from cross_modal_video_engine_tpu.io.bigfile import write_bigfile
from cross_modal_video_engine_tpu.models.dual_encoding import (
    DualEncoding, DualEncodingConfig, make_text_batch, make_video_batch)
from cross_modal_video_engine_tpu.train.checkpoint import save_checkpoint
from cross_modal_video_engine_tpu.utils.vocab import build_vocab

WORDS = ("dog cat man woman horse car road park beach ball "
         "runs walks jumps rides plays red blue small big fast").split()


def make_collection(root, collection="tinyvtt", feature="tinyfeat",
                    n_videos=12, caps_per_video=3, feat_dim=20, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(root, collection)
    feat_dir = os.path.join(base, "FeatureData", feature)
    text_dir = os.path.join(base, "TextData")
    os.makedirs(text_dir, exist_ok=True)

    # frame features: each video has 3-9 frames
    names, rows, video2frames = [], [], {}
    for i in range(n_videos):
        vid = f"video{i}"
        nf = int(rng.integers(3, 10))
        fids = [f"{vid}_f{j}" for j in range(nf)]
        video2frames[vid] = fids
        names.extend(fids)
        rows.append(rng.standard_normal((nf, feat_dim)).astype(np.float32))
    write_bigfile(feat_dir, names, np.concatenate(rows))
    with open(os.path.join(feat_dir, "video2frames.txt"), "w") as f:
        f.write(repr(video2frames))

    # captions
    caps, lines = [], []
    for i in range(n_videos):
        for c in range(caps_per_video):
            words = rng.choice(WORDS, size=rng.integers(3, 7))
            cap = " ".join(words)
            caps.append(cap)
            lines.append(f"video{i}#{c} {cap}")
    cap_file = os.path.join(text_dir, f"{collection}.caption.txt")
    with open(cap_file, "w") as f:
        f.write("\n".join(lines))

    # vocabularies
    rnn_vocab, _ = build_vocab(caps, "rnn", threshold=1)
    bow_vocab, _ = build_vocab(caps, "bow", threshold=1)
    for style, vocab in (("rnn", rnn_vocab), ("bow", bow_vocab)):
        d = os.path.join(text_dir, "vocabulary", style)
        os.makedirs(d, exist_ok=True)
        vocab.save(os.path.join(d, "word_vocab_5.json"))
    return dict(base=base, feat_dir=feat_dir, cap_file=cap_file,
                rnn_vocab=rnn_vocab, bow_vocab=bow_vocab, feat_dim=feat_dim,
                collection=collection, feature=feature)


def tiny_config(info, **kw):
    base = dict(
        visual_feat_dim=info["feat_dim"], visual_rnn_size=8,
        visual_kernel_num=4, visual_kernel_sizes=(2, 3),
        vocab_size=len(info["rnn_vocab"]), bow_vocab_size=len(info["bow_vocab"]),
        word_dim=12, text_rnn_size=8, text_kernel_num=4,
        text_kernel_sizes=(2, 3), hidden_size=16, common_dim=24,
    )
    base.update(kw)
    return DualEncodingConfig(**base)


def make_checkpoint(root, info, seed=0, support=2):
    cfg = tiny_config(info)
    model = DualEncoding(cfg)
    rng = np.random.default_rng(seed)
    videos = make_video_batch(
        [rng.standard_normal((5, cfg.visual_feat_dim)).astype(np.float32)], 8)
    text = make_text_batch([[1, 4, 2]],
                           np.zeros((1, cfg.bow_vocab_size), np.float32), 8)
    import jax.numpy as jnp
    sup = None
    if support:
        from cross_modal_video_engine_tpu.models.dual_encoding import TextBatch
        sup = TextBatch(
            ids=jnp.ones((1, support, 8), jnp.int32),
            bows=jnp.zeros((1, support, cfg.bow_vocab_size), jnp.float32),
            lengths=jnp.full((1, support), 3, jnp.int32),
            mask=jnp.ones((1, support, 8), jnp.float32))
    variables = model.init(jax.random.key(seed), videos, text, sup)
    ckpt = os.path.join(root, "ckpt")
    save_checkpoint(ckpt, variables, cfg, {"epoch": 0})
    return ckpt, cfg

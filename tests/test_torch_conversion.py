"""Weight-conversion parity: a torch replica of the reference encoders is
random-initialized, converted with convert_linas_dual_encoding, and must
produce the same embeddings through the flax model (eval mode)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert import convert_linas_dual_encoding
from cross_modal_video_engine_tpu.models.dual_encoding import (
    DualEncoding, DualEncodingConfig, TextBatch, VideoBatch)

rng = np.random.default_rng(191)

D_VIS, H, K = 10, 6, 4
VK = (2, 3)
TK = (2, 3)
VOCAB, WDIM, BOW = 25, 8, 15
COMMON = 16


class TorchVideoEnc(tnn.Module):
    """Reference Video_multilevel_encoding math (model.py:119-176)."""

    def __init__(self):
        super().__init__()
        self.rnn = tnn.GRU(D_VIS, H, batch_first=True, bidirectional=True)
        self.convs1 = tnn.ModuleList([
            tnn.Conv2d(1, K, (ws, 2 * H), padding=(ws - 1, 0)) for ws in VK])

    def forward(self, videos, origin, lengths, mask):
        gru_init_out, _ = self.rnn(videos)
        mean_gru = torch.zeros(gru_init_out.size(0), 2 * H)
        for i, batch in enumerate(gru_init_out):
            mean_gru[i] = torch.mean(batch[: lengths[i]], 0)
        gru_out = mean_gru
        m = mask.unsqueeze(2).expand(-1, -1, gru_init_out.size(2))
        gi = gru_init_out * m
        con_out = gi.unsqueeze(1)
        con_out = [F.relu(conv(con_out)).squeeze(3) for conv in self.convs1]
        con_out = [F.max_pool1d(i, i.size(2)).squeeze(2) for i in con_out]
        con_out = torch.cat(con_out, 1)
        return torch.cat((gru_out, con_out, origin), 1)


class TorchTextEnc(tnn.Module):
    """Reference Text_multilevel_encoding_ori math (model.py:191-260)."""

    def __init__(self):
        super().__init__()
        self.embed = tnn.Embedding(VOCAB, WDIM)
        self.rnn = tnn.GRU(WDIM, H, batch_first=True, bidirectional=True)
        self.convs1 = tnn.ModuleList([
            tnn.Conv2d(1, K, (ws, 2 * H), padding=(ws - 1, 0)) for ws in TK])

    def forward(self, ids, bows, lengths, mask):
        x = self.embed(ids)
        sl, idx = torch.sort(lengths, descending=True)
        _, inv = torch.sort(idx)
        packed = pack_padded_sequence(x[idx], sl.numpy(), batch_first=True)
        out, _ = self.rnn(packed)
        padded, _ = pad_packed_sequence(out, batch_first=True,
                                        total_length=ids.shape[1])
        gru_init_out = padded[inv]
        gru_out = torch.zeros(ids.size(0), 2 * H)
        for i, batch in enumerate(gru_init_out):
            gru_out[i] = torch.mean(batch[: int(lengths[i])], 0)
        con = gru_init_out.unsqueeze(1)
        con = [F.relu(conv(con)).squeeze(3) for conv in self.convs1]
        con = [F.max_pool1d(i, i.size(2)).squeeze(2) for i in con]
        con_out = torch.cat(con, 1)
        return torch.cat((gru_out, con_out, bows), 1)


class TorchMapping(tnn.Module):
    def __init__(self, in_dim):
        super().__init__()
        self.mapping = tnn.Sequential()
        self.mapping.fc1 = tnn.Linear(in_dim, COMMON)
        self.mapping.bn_1 = tnn.BatchNorm1d(COMMON)

    def forward(self, x):
        y = self.mapping.bn_1(self.mapping.fc1(x))
        return y / y.norm(dim=1, keepdim=True)


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    vid_enc = TorchVideoEnc().eval()
    txt_enc = TorchTextEnc().eval()       # teacher (student-style, no k/q)
    stu_enc = TorchTextEnc().eval()
    vid_dim = 2 * H + K * len(VK) + D_VIS
    txt_dim = 2 * H + K * len(TK) + BOW
    vid_map = TorchMapping(vid_dim).eval()
    txt_map = TorchMapping(txt_dim).eval()
    stu_map = TorchMapping(txt_dim).eval()
    # randomize BN running stats so conversion is actually exercised
    for m in (vid_map, txt_map, stu_map):
        m.mapping.bn_1.running_mean.copy_(
            torch.from_numpy(rng.standard_normal(COMMON).astype(np.float32)))
        m.mapping.bn_1.running_var.copy_(
            torch.from_numpy(rng.random(COMMON).astype(np.float32) + 0.5))

    state_dicts = [
        vid_enc.state_dict(), txt_enc.state_dict(), vid_map.state_dict(),
        txt_map.state_dict(), stu_map.state_dict(), stu_enc.state_dict(),
    ]
    cfg = DualEncodingConfig(
        visual_feat_dim=D_VIS, visual_rnn_size=H, visual_kernel_num=K,
        visual_kernel_sizes=VK, vocab_size=VOCAB, bow_vocab_size=BOW,
        word_dim=WDIM, text_rnn_size=H, text_kernel_num=K,
        text_kernel_sizes=TK, common_dim=COMMON,
        teacher_model="student", student_model="de+map")
    variables = convert_linas_dual_encoding(state_dicts, cfg)
    model = DualEncoding(cfg)
    torch_parts = dict(vid_enc=vid_enc, txt_enc=txt_enc, stu_enc=stu_enc,
                       vid_map=vid_map, txt_map=txt_map, stu_map=stu_map)
    return model, variables, torch_parts


def test_video_path_parity(converted):
    model, variables, tp = converted
    B, T = 3, 7
    lengths = np.array([7, 4, 2])
    mask = (np.arange(T)[None] < lengths[:, None]).astype(np.float32)
    frames = rng.standard_normal((B, T, D_VIS)).astype(np.float32)
    frames = frames * mask[..., None]
    origin = rng.standard_normal((B, D_VIS)).astype(np.float32)

    with torch.no_grad():
        feat_t = tp["vid_enc"](torch.from_numpy(frames),
                               torch.from_numpy(origin),
                               lengths, torch.from_numpy(mask))
        want = tp["vid_map"](feat_t).numpy()

    videos = VideoBatch(jnp.asarray(frames), jnp.asarray(origin),
                        jnp.asarray(lengths), jnp.asarray(mask))
    got = np.asarray(model.apply(variables, videos, method="embed_vis"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_text_student_path_parity(converted):
    model, variables, tp = converted
    B, L = 3, 6
    lengths = np.array([6, 3, 2])
    mask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    ids = (rng.integers(1, VOCAB, (B, L)) * mask).astype(np.int64)
    bows = rng.standard_normal((B, BOW)).astype(np.float32)

    with torch.no_grad():
        feat_t = tp["stu_enc"](torch.from_numpy(ids),
                               torch.from_numpy(bows),
                               torch.from_numpy(lengths),
                               torch.from_numpy(mask))
        want = tp["stu_map"](feat_t).numpy()

    text = TextBatch(jnp.asarray(ids, jnp.int32), jnp.asarray(bows),
                     jnp.asarray(lengths, jnp.int32), jnp.asarray(mask))
    got = np.asarray(model.apply(variables, text,
                                 method="embed_txt_distill"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

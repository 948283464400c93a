"""Caption head (RNNDecoderHead) weight-conversion parity vs a torch
replica of the reference decoder loop (decoder_head.py:147-227)."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from cross_modal_video_engine_tpu.convert.torch_import import (
    convert_rnn_decoder_head)
from cross_modal_video_engine_tpu.models.decoder_head import (
    RNNDecoderConfig, RNNDecoderHead)

rng = np.random.default_rng(371)

C, H, MAXLEN, B = 7, 12, 4, 3
THRESH = 0.5


class TorchHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.rnn = tnn.GRU(H + C, H, batch_first=True)
        self.start_emb = tnn.Embedding(1, C)
        self.out = tnn.Linear(H, C)

    def forward(self, enc, targets=None, mode="train"):
        idx = torch.LongTensor([0])
        probs_seq = []
        hidden = None
        probs = None
        for i in range(MAXLEN):
            if i == 0:
                cur = self.start_emb(idx).squeeze(0).repeat(enc.size(0), 1)
            elif mode == "train":
                cur = targets[:, i, :]
            else:
                cur = (probs > THRESH).float()
            inp = torch.cat([cur, enc], dim=1).unsqueeze(1)
            out, hidden = self.rnn(inp, hidden)
            probs = torch.sigmoid(self.out(out.squeeze(1)))
            probs_seq.append(probs.unsqueeze(1))
        return torch.cat(probs_seq, 1)


def test_decoder_head_conversion_parity():
    torch.manual_seed(3)
    tm = TorchHead().eval()
    sd = {f"cls_head.{k}": v for k, v in tm.state_dict().items()}
    params = convert_rnn_decoder_head(sd)
    cfg = RNNDecoderConfig(num_classes=C, in_channels=H, max_len=MAXLEN,
                           threshold=THRESH, input_dropout_p=0.1)
    head = RNNDecoderHead(cfg)

    enc = rng.standard_normal((B, H)).astype(np.float32)
    tgt = (rng.random((B, MAXLEN, C)) > 0.5).astype(np.float32)

    with torch.no_grad():
        want_train = tm(torch.from_numpy(enc), torch.from_numpy(tgt),
                        "train").numpy()
        want_inf = tm(torch.from_numpy(enc), mode="inference").numpy()

    variables = {"params": params}
    got_train = np.asarray(head.apply(variables, jnp.asarray(enc),
                                      jnp.asarray(tgt), mode="train"))
    np.testing.assert_allclose(got_train, want_train, rtol=2e-4, atol=2e-5)

    got_inf = np.asarray(head.apply(variables, jnp.asarray(enc),
                                    mode="inference"))
    np.testing.assert_allclose(got_inf, want_inf, rtol=2e-4, atol=2e-5)

"""BASELINE.json config smoke tests: each advertised configuration runs
end-to-end (encode → decode → captions) at CPU-sized dims.

The five configs (BASELINE.json "configs"):
  1. MobileNet encoder + 2-layer transformer decoder, greedy decode
  2. VGG backbone + transformer decoder, beam=2 eval
  3. ResNet-50 FPN + multi-transformer decoder, beam=8
  4. DenseNet FPN encoder + co-attention fusion decoder, beam=8 eval
  5. batched serving batch-64 beam-8 — covered by bench.py / test_fused_beam

Full dims would take minutes per backbone on CPU, so each runs at 128² input
with small d_model — the graph structure (backbone taps → FPN → heads →
co-attention → UMV encoder → cached beam decode) is identical to the flagship.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpn_mt_image_captioning_tpu.decode.beam_search import beam_search, greedy_decode
from fpn_mt_image_captioning_tpu.models.positional import create_masks
from fpn_mt_image_captioning_tpu.models.transformer import Transformer

VOCAB, MAXLEN, SIZE = 40, 6, 128


def build(backbone_name, rng):
    model = Transformer(
        num_layers=2, d_model=32, num_heads=4, dff=64,
        input_vocab_size=(SIZE // 16) ** 2, target_vocab_size=VOCAB,
        max_seq_len=MAXLEN, backbone_name=backbone_name,
    )
    img = jax.random.normal(rng, (2, SIZE, SIZE, 3)) * 0.5
    tar = jnp.ones((2, 4), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, img, tar, True, create_masks(tar)
    )
    return model, variables, img


@pytest.mark.slow
@pytest.mark.parametrize(
    "backbone_name,beam",
    [
        ("mobilenet128_1.0", 0),   # config 1: greedy
        ("vgg16", 2),              # config 2
        ("resnet50", 8),           # config 3
        ("densenet121", 8),        # config 4
    ],
)
def test_baseline_config_decodes(backbone_name, beam, rng):
    model, variables, img = build(backbone_name, rng)
    enc = model.apply(variables, img, train=False, method=Transformer.encode)
    assert enc.shape[0] == 2 and enc.shape[-1] == 32
    if beam == 0:
        seqs, lengths = greedy_decode(
            model, variables, enc, max_len=MAXLEN, start_token=1,
            end_token=VOCAB - 1,
        )
    else:
        seqs, lengths, scores = beam_search(
            model, variables, enc, beam_n=beam, max_len=MAXLEN,
            start_token=1, end_token=VOCAB - 1,
        )
        assert np.all(np.isfinite(np.asarray(scores)))
    seqs, lengths = np.asarray(seqs), np.asarray(lengths)
    assert seqs.shape == (2, MAXLEN)
    assert np.all((seqs >= 0) & (seqs < VOCAB))
    assert np.all(lengths <= MAXLEN)

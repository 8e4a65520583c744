"""Produce benchmarks/tf_parity.json — cross-framework execution-parity evidence.

Runs the ACTUAL reference TF/Keras model (/root/reference, imported and
executed via tests/tf_reference.py) side by side with this framework's Flax
model under identical weights, and records:

  * max |Δ| of encoder output, decoder logits (shared encoder output), and
    the full training-mode forward;
  * the 6-step train-loss trajectory of the reference loop
    (utils/pipeline.py:29-80) vs our components, per-step deltas.

Usage (CPU; ~5 min on 1 core):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu TF_ENABLE_ONEDNN_OPTS=0 \
        python scripts/tf_parity_run.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import tensorflow as tf

from tf_reference import build_reference_transformer, extract_flax_updates

NL, D, H, DFF, VOCAB, L, IMG = 2, 32, 4, 64, 50, 11, 256
IVS = (IMG // 16) ** 2
STEPS, WARM = 6, 4


def main():
    ref, rt = build_reference_transformer(
        num_layers=NL, d_model=D, num_heads=H, dff=DFF,
        input_vocab_size=IVS, target_vocab_size=VOCAB, rate=0.0,
        max_seq_len=L + 1,
    )
    warm_tar = tf.constant(np.ones((1, L), np.int64))
    _ = ref(tf.constant(np.zeros((1, IMG, IMG, 3), np.float32)), warm_tar,
            True, rt.create_masks(warm_tar))
    upd, ret_layers = extract_flax_updates(ref, D)

    import jax
    import jax.numpy as jnp
    import optax

    from fpn_mt_image_captioning_tpu.models.positional import create_masks
    from fpn_mt_image_captioning_tpu.models.transformer import Transformer
    from fpn_mt_image_captioning_tpu.train.losses import masked_sparse_ce
    from fpn_mt_image_captioning_tpu.train.schedule import (
        custom_schedule, make_optimizer)
    from fpn_mt_image_captioning_tpu.utils.weight_import import (
        apply_flat_updates, import_retinanet_weights)

    model = Transformer(num_layers=NL, d_model=D, num_heads=H, dff=DFF,
                        input_vocab_size=IVS, target_vocab_size=VOCAB,
                        rate=0.0, max_seq_len=L + 1)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, IMG, IMG, 3)),
                           jnp.ones((1, L), jnp.int32), True, None)
    variables, rep1 = import_retinanet_weights(variables, ret_layers)
    variables, rep2 = apply_flat_updates(variables, upd)
    assert not rep1.missed and not rep2.missed, (rep1.missed, rep2.missed)

    rs = np.random.RandomState(0)
    img = rs.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    tar = rs.randint(1, VOCAB, (2, L)).astype(np.int64)
    tar[:, -2:] = 0
    mask_tf = rt.create_masks(tf.constant(tar))
    mask = create_masks(jnp.asarray(tar, jnp.int32))

    ref_enc = ref.encoder(tf.constant(img), False, None)
    our_enc = model.apply(variables, jnp.asarray(img), train=False,
                          method=Transformer.encode)
    d_enc = float(np.abs(np.asarray(our_enc) - ref_enc.numpy()).max())

    ref_dec, _ = ref(ref_enc, tf.constant(tar), False, mask_tf)
    our_dec, _ = model.apply(variables, jnp.asarray(ref_enc.numpy()),
                             jnp.asarray(tar, jnp.int32), False, mask)
    d_dec = float(np.abs(np.asarray(our_dec) - ref_dec.numpy()).max())

    ref_tr, _ = ref(tf.constant(img), tf.constant(tar), True, mask_tf)
    (our_tr, _), _ = model.apply(
        variables, jnp.asarray(img), jnp.asarray(tar, jnp.int32), True, mask,
        rngs={"dropout": rng}, mutable=["batch_stats"])
    d_tr = float(np.abs(np.asarray(our_tr) - ref_tr.numpy()).max())

    # ---- trajectory -----------------------------------------------------------
    rs = np.random.RandomState(1)
    imgs = rs.uniform(-1, 1, (STEPS, 2, IMG, IMG, 3)).astype(np.float32)
    caps = rs.randint(1, VOCAB, (STEPS, 2, L + 1)).astype(np.int64)
    caps[:, :, -2:] = 0

    class _F32Sched(tf.keras.optimizers.schedules.LearningRateSchedule):
        def __init__(self, inner):
            self.inner = inner

        def __call__(self, step):
            return self.inner(tf.cast(step, tf.float32))

        def get_config(self):
            return {}

    opt = tf.keras.optimizers.Adam(_F32Sched(rt.CustomSchedule(DFF, WARM)),
                                   beta_1=0.9, beta_2=0.98, epsilon=1e-9,
                                   amsgrad=True, clipnorm=1.0)
    sce = tf.keras.losses.SparseCategoricalCrossentropy(
        from_logits=True, reduction="none")

    ref_losses = []
    for s in range(STEPS):
        cap = tf.constant(caps[s])
        tar_inp, tar_real = cap[:, :-1], cap[:, 1:]
        m = rt.create_masks(tar_inp)
        with tf.GradientTape() as tape:
            pred, _ = ref(tf.constant(imgs[s]), tar_inp, True, m)
            loss_ = sce(tar_real, pred) * tf.cast(
                tf.math.logical_not(tf.math.equal(tar_real, 0)), tf.float32)
            loss = tf.reduce_mean(loss_)
        grads = tape.gradient(loss, ref.trainable_variables)
        opt.apply_gradients(zip(grads, ref.trainable_variables))
        ref_losses.append(float(loss))

    params, stats = variables["params"], variables["batch_stats"]
    tx = make_optimizer(custom_schedule(DFF, WARM))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, img, cap):
        tar_inp, tar_real = cap[:, :-1], cap[:, 1:]
        m = create_masks(tar_inp)

        def loss_fn(p):
            (logits, _), muts = model.apply(
                {"params": p, "batch_stats": stats}, img, tar_inp, True, m,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return masked_sparse_ce(tar_real, logits), muts["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state2, loss

    our_losses = []
    for s in range(STEPS):
        params, stats, opt_state, loss = step(
            params, stats, opt_state,
            jnp.asarray(imgs[s]), jnp.asarray(caps[s], jnp.int32))
        our_losses.append(float(loss))

    out = {
        "dims": {"num_layers": NL, "d_model": D, "num_heads": H, "dff": DFF,
                 "vocab": VOCAB, "image": IMG, "seq_len": L},
        "weights_transferred": {
            "flat_updates": len(rep2.matched),
            "retinanet_entries": len(rep1.matched),
        },
        "max_abs_delta": {
            "encoder_output": d_enc,
            "decoder_logits_shared_enc": d_dec,
            "train_mode_logits": d_tr,
        },
        "trajectory": {
            "warmup_steps": WARM,
            "ref_losses": ref_losses,
            "our_losses": our_losses,
            "per_step_abs_delta": [
                abs(a - b) for a, b in zip(ref_losses, our_losses)
            ],
        },
        "notes": "reference executed in-process via tests/tf_reference.py; "
                 "optimizer = keras-exact AMSGrad Adam (train/schedule.py:keras_adam)",
    }
    path = os.path.join(REPO, "benchmarks", "tf_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["max_abs_delta"]))
    print(json.dumps(out["trajectory"]["per_step_abs_delta"]))
    print("wrote", path)


if __name__ == "__main__":
    main()

"""LPCNet vocoder training (clean + coded-feature finetune).

Capability parity with the reference pipeline's external vocoder
training (reference README.md:30-40: training_tf2/train_lpcnet.py, and
its `--quantize` finetune on coded features; the in-repo analogue is
src/train.py with Libri_lpc_data_retrain + upd_f_only):

* teacher-forced cross-entropy on mu-law excitation, grad-clip 10,
* `train.upd_f_only=true` freezes the sample-rate network and tunes
  only the frame conditioning net (the reference's upd_f_only /
  --quantize pattern) - used when finetuning on coded features,
* `data_dir=<generate_qtz output>` trains on coded feature windows
  (the dataset_retrain path).

Run:  python -m fpsc_tpu.train.train_lpcnet data.synthetic=true \
          train.epochs=2 train.debugging=true
"""
from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpsc_tpu.config.config import Config, parse_cli
from fpsc_tpu.data.dataset import Dataset, build_dataset
from fpsc_tpu.dsp import constants as C
from fpsc_tpu.models import lpcnet
from fpsc_tpu.parallel import mesh as meshlib
from fpsc_tpu.train import checkpoint as ckpt
from fpsc_tpu.utils import diagnostics


def vocoder_inputs(batch: Dict, normalize: bool = True) -> Dict:
    """Batch -> arrays for the vocoder: feat (B, L, 20) normalised,
    periods (B, L) int32 via the reference formula (src/train.py:123),
    lpc (B, L, 16) un-normalised, x (B, L*160) waveform."""
    feat = batch["feat"][:, C.CONTEXT_FRAMES:-C.CONTEXT_FRAMES, :]
    nm = feat / C.MAXI if normalize else feat
    periods = (0.1 + 50.0 * feat[..., 18] + 100.0).astype(np.int32)
    return {
        "feat": nm[..., :C.NB_USED_FEATURES].astype(np.float32),
        "periods": periods,
        "lpc": feat[..., -C.LPC_ORDER:].astype(np.float32),
        "x": batch["x"].astype(np.float32),
    }


def coded_dataset(coded_dir: str, base: Dataset) -> Dataset:
    """Dataset over CODED feature windows (from generate_qtz_features)
    paired with the original waveforms - the reference's
    Libri_lpc_data_retrain path (dataset_retrain.py:44-67), used for
    the --quantize-style vocoder finetune."""
    from fpsc_tpu.data.dataset import Utterance
    items = []
    for utt in base.items:
        path = os.path.join(coded_dir, "train", f"{utt.name}.npy")
        if not os.path.exists(path):
            continue
        windows = np.load(path).astype(np.float32)
        n = windows.shape[0]
        items.append(Utterance(
            utt.name,
            utt.waveform[: n * C.SAMPLES_PER_CHUNK],
            windows))
    return Dataset(items, base.chunks, base.task, base.normalize,
                   qtz_pitch=base.qtz_pitch,
                   process_index=base.process_index,
                   process_count=base.process_count)


def auto_time_chunks(batch_size: int, chunks: int, bunch: int,
                     gru_a_units: int) -> int:
    """Smallest frame-count-divisor `time_chunks` that keeps the
    one-shot CE's (B, T/bunch, 3H) f32 pre-activation buffer under
    XLA's 2 GiB single-buffer compile boundary — 0 when one-shot fits.
    The boundary is measured, not theoretical: 2.12 GB compiles,
    4.25 GB hard-fails the remote compile (VALIDATION.md round 5,
    scripts/bench_train_scaling.py); this rule reproduces the
    measured-good points exactly (bunch=2: B128->tc2, B256->tc5,
    B512->tc9; unbunched: B64->tc2, B128->tc5, B512->tc18).  Set
    lpcnet.time_chunks=1 to force the (segment-scan) one-shot."""
    n_frames = chunks * (C.SAMPLES_PER_CHUNK // C.FRAME_SIZE)
    steps = chunks * C.SAMPLES_PER_CHUNK // bunch
    buf = 4 * batch_size * steps * 3 * gru_a_units
    lim = 2.13e9                  # proven segment size (2.12 GB ok)
    if buf <= lim:
        return 0
    want = int(np.ceil(buf / lim))
    return next(n for n in range(want, n_frames + 1)
                if n_frames % n == 0)


def make_step(tx, loss_fn=None, noise_levels: int = 0,
              time_chunks: int = 0):
    """noise_levels > 0 enables mu-law noise injection on the
    teacher-forced signal path (lpcnet.noisy_streams — the classic
    LPCNet exposure-bias mitigation); eval always runs clean.
    time_chunks > 0 computes the CE as a rematerialised scan over
    time segments (lpcnet._chunked_nll) — identical loss, bounded
    activation memory; required for batch >= 64 at flagship shapes."""
    loss_fn = loss_fn or lpcnet.loss_fn
    if time_chunks:
        # all three loss variants (lpcnet.loss_fn, lpcnet_bunched.
        # loss_fn / loss_fn4) take the kwarg
        loss_fn = functools.partial(loss_fn, time_chunks=time_chunks)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feat, periods, x, lpc, key):
        if noise_levels > 0:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, feat, periods, x, lpc,
                noise_key=key, noise_levels=noise_levels)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, feat, periods, x, lpc)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, feat, periods, x, lpc):
        return loss_fn(params, feat, periods, x, lpc)

    return train_step, eval_step


def _plot_diagnostics(cfg, label, epoch, params, arrs, bunch):
    """Per-plot_every-epoch inspection images (reference
    src/train.py:153-165 excitation traces + utils.py:160-179
    spectrograms): teacher-forced excitation target vs the model's
    argmax draw (bunch=1 path), and a log-mel spectrogram of the
    training signal."""
    exc_tgt, pred_t = lpcnet.teacher_streams(arrs["x"][:1],
                                             arrs["lpc"][:1])
    exc_out = None
    if bunch == 1:
        from fpsc_tpu.dsp.mulaw import u2l
        logits = lpcnet.forward(params, arrs["feat"][:1],
                                arrs["periods"][:1], arrs["x"][:1],
                                exc_tgt, pred_t)
        exc_out = np.asarray(
            u2l(jnp.argmax(logits, axis=-1)))[0] / 32768.0
    diagnostics.save_excitation_plot(
        cfg.train.save_dir, label, epoch, np.asarray(exc_tgt)[0],
        exc_out)
    diagnostics.save_spectrogram(
        cfg.train.save_dir, label, epoch, np.asarray(arrs["x"])[0],
        name="signal")


def _base_freeze_labels(base: lpcnet.LPCNetParams):
    # freeze the sample-rate net; tune only the frame/conditioning
    # net (reference train.py:259-265 / LPCNet --quantize pattern)
    frame_fields = {"period_emb", "conv1", "conv1_b", "conv2",
                    "conv2_b", "fdense1", "fdense2"}
    return lpcnet.LPCNetParams(*[
        jax.tree_util.tree_map(
            lambda _: "train" if name in frame_fields else "freeze",
            sub)
        for name, sub in zip(lpcnet.LPCNetParams._fields, base)])


def build_optimizer(cfg: Config, params):
    from fpsc_tpu.models import lpcnet_bunched
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(cfg.train.learning_rate),
    )
    if cfg.train.upd_f_only:
        if isinstance(params, (lpcnet_bunched.BunchedParams,
                               lpcnet_bunched.Bunched4Params)):
            labels = type(params)(
                base=_base_freeze_labels(params.base),
                fc3=jax.tree_util.tree_map(lambda _: "freeze",
                                           params.fc3),
                fc4=jax.tree_util.tree_map(lambda _: "freeze",
                                           params.fc4))
        else:
            labels = _base_freeze_labels(params)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def run(cfg: Config, data_dir: Optional[str] = None,
        init_params: Optional[lpcnet.LPCNetParams] = None
        ) -> Tuple[lpcnet.LPCNetParams, float]:
    """init_params warm-starts in-process (e.g. coded-feature finetune
    of a clean-trained model, the external --quantize pattern);
    train.transfer_model does the same from a checkpoint."""
    mesh = meshlib.make_mesh()
    mcfg = lpcnet.LPCNetConfig(
        gru_a_units=cfg.lpcnet.gru_a_units,
        gru_b_units=cfg.lpcnet.gru_b_units,
        embed_dim=cfg.lpcnet.embed_dim,
        cond_units=cfg.lpcnet.cond_units,
        levels=cfg.lpcnet.levels,
        frame_kernel=cfg.lpcnet.frame_kernel,
    )
    from fpsc_tpu.models import lpcnet_bunched
    assert cfg.lpcnet.bunch in (1, 2, 4), (
        f"lpcnet.bunch={cfg.lpcnet.bunch}: 1 (plain LPCNet), "
        f"2 (pairs) and 4 are implemented")
    bunch = cfg.lpcnet.bunch
    if init_params is not None:
        # deep-copy: train_step donates its param buffers, which would
        # otherwise delete the caller's arrays out from under it
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), init_params)
        bunch = {lpcnet_bunched.BunchedParams: 2,
                 lpcnet_bunched.Bunched4Params: 4}.get(type(params), 1)
    elif bunch == 2:
        params = lpcnet_bunched.init_bunched(
            jax.random.PRNGKey(cfg.train.seed), mcfg)
    elif bunch == 4:
        params = lpcnet_bunched.init_bunched4(
            jax.random.PRNGKey(cfg.train.seed), mcfg)
    else:
        params = lpcnet.init_lpcnet(jax.random.PRNGKey(cfg.train.seed),
                                    mcfg)

    if cfg.train.transfer_model:
        payload = ckpt.load(ckpt.checkpoint_path(
            cfg.train.save_dir, cfg.train.transfer_model,
            cfg.train.transfer_epoch))
        params = ckpt.restore_params(
            params, payload, f"vocoder (bunch={cfg.lpcnet.bunch})")
        print("loaded transfer vocoder checkpoint")

    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    params = meshlib.replicate(mesh, params)

    train_ds = build_dataset(cfg.data, "train")
    if data_dir:
        train_ds = coded_dataset(data_dir, train_ds)
        print(f"finetuning on coded features from {data_dir} "
              f"({len(train_ds)} utterances)")
    loss_fns = {1: lpcnet.loss_fn, 2: lpcnet_bunched.loss_fn,
                4: lpcnet_bunched.loss_fn4}
    tc = cfg.lpcnet.time_chunks or auto_time_chunks(
        cfg.data.batch_size, cfg.data.chunks, bunch,
        cfg.lpcnet.gru_a_units)
    if tc and not cfg.lpcnet.time_chunks:
        print(f"one-shot CE buffer crosses the 2 GiB compile "
              f"boundary at batch {cfg.data.batch_size}; "
              f"auto lpcnet.time_chunks={tc}")
    train_step, eval_step = make_step(tx, loss_fns[bunch],
                                      cfg.lpcnet.noise_levels, tc)
    # ramp-in schedule: a separate CLEAN step for the warmup phase
    # (lpcnet.noise_warmup_frac of the budget), then switch to the
    # noisy step.  Both are compiled before the wall clock starts so
    # equal-wall-time A/Bs don't charge the ramp arm a mid-budget
    # compile.
    ramp = (cfg.lpcnet.noise_levels > 0
            and cfg.lpcnet.noise_warmup_frac > 0.0)
    clean_step = (make_step(tx, loss_fns[bunch], 0, tc)[0] if ramp
                  else train_step)
    noise_base = jax.random.PRNGKey(cfg.train.seed + 77)

    label = cfg.label + "_s"
    min_loss = float("inf")
    global_step = 0
    # wall-budget clock starts AFTER the first optimizer step returns:
    # the first step pays the XLA compile (minutes on the tunneled
    # backend), which would otherwise eat an arbitrary share of
    # max_seconds and unbalance equal-wall-time A/Bs
    train_t0 = None
    sparsify = jax.jit(
        {1: lpcnet.sparsify_gru_a, 2: lpcnet_bunched.sparsify_gru_a,
         4: lpcnet_bunched.sparsify_gru_a4}[bunch],
        static_argnames=("density", "block"))
    for epoch in range(cfg.train.epochs):
        t0 = time.time()
        total, n = 0.0, 0
        for batch in train_ds.iter_batches(cfg.data.batch_size,
                                           seed=cfg.train.seed + epoch):
            arrs = vocoder_inputs(batch, cfg.data.normalize)
            arrs = meshlib.shard_batch(mesh, arrs)
            if ramp and train_t0 is None:
                # pre-pay the NOISY step's compile on throwaway copies
                # so the post-warmup switch is free under the clock
                p2 = jax.tree_util.tree_map(
                    lambda a: jnp.array(a, copy=True), params)
                o2 = jax.tree_util.tree_map(
                    lambda a: (jnp.array(a, copy=True)
                               if hasattr(a, "dtype") else a), opt_state)
                _, _, warm_loss = train_step(
                    p2, o2, arrs["feat"], arrs["periods"], arrs["x"],
                    arrs["lpc"], noise_base)
                float(warm_loss)
            if ramp:
                if cfg.train.max_seconds:
                    noise_on = (train_t0 is not None
                                and time.time() - train_t0
                                >= cfg.lpcnet.noise_warmup_frac
                                * cfg.train.max_seconds)
                else:
                    noise_on = (epoch >= cfg.lpcnet.noise_warmup_frac
                                * cfg.train.epochs)
            else:
                noise_on = cfg.lpcnet.noise_levels > 0
            step_fn = train_step if noise_on else clean_step
            params, opt_state, loss = step_fn(
                params, opt_state, arrs["feat"], arrs["periods"],
                arrs["x"], arrs["lpc"],
                jax.random.fold_in(noise_base, global_step))
            if train_t0 is None:
                float(loss)     # forced host pull: block_until_ready
                                # returns early on the axon backend
                train_t0 = time.time()
            global_step += 1
            if cfg.lpcnet.gru_a_density < 1.0:
                d = lpcnet.sparsity_schedule(
                    global_step, cfg.lpcnet.sparsify_start,
                    cfg.lpcnet.sparsify_end, cfg.lpcnet.gru_a_density)
                if d < 1.0:
                    # density is a STATIC jit arg: quantise the ramp
                    # to 0.01 steps so the whole schedule costs <=80
                    # compiles, not one per step (measured 3-16 s/ep
                    # vs 0.9 s/ep during the ramp at round(d, 3))
                    params = sparsify(
                        params, density=round(d, 2),
                        block=tuple(cfg.lpcnet.sparsify_block))
            total += float(loss)
            n += 1
            if cfg.train.debugging or (
                    cfg.train.steps_per_epoch
                    and n >= cfg.train.steps_per_epoch):
                break
        duration = time.time() - t0
        ckpt.log_epoch(cfg.train.save_dir, label, epoch, duration,
                       total / max(n, 1), 0.0, cfg.train.debugging)
        if diagnostics.should_plot(cfg.train.plot_every, epoch):
            _plot_diagnostics(cfg, label, epoch, params, arrs, bunch)
        should_save = (epoch % max(cfg.train.save_every, 1) == 0
                       or epoch == cfg.train.epochs - 1)
        if not cfg.train.debugging and should_save:
            ckpt.save(ckpt.checkpoint_path(cfg.train.save_dir, label,
                                           epoch),
                      params, opt_state, step=epoch)
        min_loss = min(min_loss, total / max(n, 1))
        if (cfg.train.max_seconds and train_t0 is not None
                and time.time() - train_t0 > cfg.train.max_seconds):
            print(f"wall-time budget {cfg.train.max_seconds:.0f}s "
                  f"reached after epoch {epoch} "
                  f"({global_step} updates)", flush=True)
            break
    return params, min_loss


if __name__ == "__main__":
    run(parse_cli())

"""Joint trainer: dual-model (i2t captioner + NMT) training step.

Parity: reference `trainer.py:35-215` —
- owns both models (`build_i2t` :72-78, `build_nmt` :80-96); the
  DataParallel wrapping becomes mesh sharding outside this module;
- one `train()` step runs the i2t branch (XE or SCST, :163-173), the NMT
  branch with ppl/acc stats (:175-192), the Weight_Trans embedding
  alignment losses (:95,187-189), then a single dual-optimizer step (:193);
- `eval()` tracks best-CIDEr / best-NMT-acc (:195-215); checkpointing via
  train/checkpoint.py (:98-104).

TPU-native structure: the whole joint step is ONE jitted function — both
losses summed into one backward (parameters are disjoint except through the
Weight_Trans coupling, which the joint loss handles exactly), per-model
grad clipping inside each optax transform, LR/ss_prob/epoch logic host-side
passed as scalars (SURVEY.md §7.3). The SCST branch samples, greedy-decodes
the baseline, scores CIDEr-D on device (ops/cider.py) and applies the
policy-gradient loss without any host round-trip (reference does 2 device
syncs + host python scoring per step, rewards.py:51-66).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import models as model_zoo
from ..losses.criterion import (kld_loss, language_model_loss, nmt_loss,
                                reward_loss, weight_trans_loss)
from ..losses.rewards import get_self_critical_reward
from ..models.base import Features
from ..ops.cider import DfTable, empty_df_table
from .checkpoint import CheckpointManager
from .optimizer import DualOptim


class Trainer:
    def __init__(self, cfg, *, mesh=None, df_table: Optional[DfTable] = None,
                 joint_vocab: Optional[tuple] = None,
                 joint_vocab_y: Optional[tuple] = None,
                 nmt_teacher_params=None, rng=None):
        self.cfg = cfg
        self.mesh = mesh
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        k1, k2 = jax.random.split(rng)
        self.rng = jax.random.fold_in(rng, 7)

        self.i2t_model = model_zoo.setup(cfg) if cfg.vocab_size else None
        self.i2t_params = (self.i2t_model.init_params(k1)
                           if self.i2t_model else None)
        from ..models.nmt_transformer import make_nmt_model

        self.nmt_model = (make_nmt_model(cfg)
                          if cfg.nmt_src_vocab_size else None)
        self.nmt_params = (self.nmt_model.init_params(k2)
                           if self.nmt_model else None)
        if self.nmt_params is not None and (
                getattr(cfg, "pre_word_vecs_enc", "")
                or getattr(cfg, "pre_word_vecs_dec", "")):
            # fork train.py:442-443 load_pretrained_vectors (the fork only
            # wires this for the RNN route's Embeddings)
            from ..models.nmt import NMTModel as _NMT

            assert isinstance(self.nmt_model, _NMT), \
                "pre_word_vecs_* applies to the BiLSTM NMT route"
            self.nmt_params = _NMT.load_pretrained_embeddings(
                self.nmt_params, enc_path=cfg.pre_word_vecs_enc,
                dec_path=cfg.pre_word_vecs_dec)

        # frozen teacher for the KLD distillation path (criterion.py:285-292,
        # nmt_kld_train_flag)
        self.nmt_teacher_params = nmt_teacher_params
        self.optim = DualOptim(cfg, self.i2t_params, self.nmt_params)
        self.df_table = df_table if df_table is not None else empty_df_table()
        # joint-vocab alignment rows for Weight_Trans (criterion.py:294-434)
        self.joint_vocab = joint_vocab      # (cap_rows, nmt_src_rows) or None
        self.joint_vocab_y = joint_vocab_y  # (coco_rows, nmt_tgt_rows) or None
        self.ckpt = CheckpointManager(cfg.checkpoint_path)
        self._xe_step = None
        self._xe_step_ss = None  # retrace when the ss ramp leaves 0
        self._rl_step = None

        self.iteration = 0
        self.epoch = 0
        self.epoch_nmt = 0
        self.best_cider = None
        self.best_nmt_acc = None
        # failure detection (SURVEY.md §5.3: the reference has none — its
        # only recovery is manual restart): count consecutive non-finite
        # losses; callers abort + emergency-checkpoint past the threshold
        self.nan_steps = 0
        self.max_nan_steps = 3

    # ------------------------------------------------------------------ steps
    def _feats(self, batch: Dict[str, Any]) -> Features:
        return Features(fc_feats=batch["fc_feats"],
                        att_feats=batch.get("att_feats"),
                        attri_feats=batch.get("attri_feats"),
                        att_masks=batch.get("att_masks"))

    def _cast_compute(self, tree):
        """Mixed precision: master params stay f32 in the optimizer; the
        forward/backward computes in cfg.dtype (bf16 on TPU — MXU-native,
        f32 accumulation via preferred_element_type everywhere)."""
        if self.cfg.dtype != "bfloat16" or jax.default_backend() != "tpu":
            return tree
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def _loss_terms(self, i2t_p, nmt_p, batch, ss_prob, rng, *, rl: bool,
                    ss_enabled: bool = True):
        cfg = self.cfg
        i2t_p = self._cast_compute(i2t_p)
        nmt_p = self._cast_compute(nmt_p)
        batch = dict(batch)
        for k in ("fc_feats", "att_feats", "attri_feats"):
            if k in batch and batch[k] is not None:
                batch[k] = self._cast_compute(batch[k])
        metrics = {}
        total = jnp.float32(0.0)

        # BatchNorm momentum tracking: when the captioner has use_bn params
        # (LSTM-attention family and transformer alike), the teacher-forcing
        # forward stashes detached batch moments here and the step blends
        # them into the running stats (torch BatchNorm1d train-mode
        # behavior, AttModel.py:79-84 / TransformerModel.py:321-326).
        bn_aux = ({} if isinstance(i2t_p, dict) and "bn0" in i2t_p else None)

        if self.i2t_model is not None and cfg.i2t_train_flag:
            feats = self._feats(batch)
            if rl:
                # SCST: sample + greedy baseline WITHOUT grad (decode uses an
                # early-exit while_loop), then recompute the sampled tokens'
                # logprobs by teacher-forcing the sampled sequence. Both the
                # sampling pass (sample() decodes with training=False) and
                # the recompute run WITHOUT dropout, so the differentiated
                # distribution is exactly the one sampled from and the
                # gradient equals differentiating through the sampling pass
                # (tests/test_train.py::test_scst_recompute_gradient_exact).
                # The reference samples in train mode and backprops those
                # logprobs (rewards.py); matching sampled/differentiated
                # distributions is the invariant that matters — a dropout-on
                # recompute under a fresh rng would differentiate a
                # DIFFERENT distribution than the one sampled (ADVICE r1).
                r1, r2 = jax.random.split(rng)
                frozen = jax.lax.stop_gradient(i2t_p)
                gen, _ = self.i2t_model.sample(frozen, feats, r1, greedy=False)
                greedy, _ = self.i2t_model.sample(frozen, feats, r2,
                                                  greedy=True)
                gen = jax.lax.stop_gradient(gen)
                adv, rs = get_self_critical_reward(
                    gen, jax.lax.stop_gradient(greedy),
                    batch["gts"], batch["gts_masks"], self.df_table,
                    cider_weight=cfg.cider_reward_weight,
                    bleu_weight=cfg.bleu_reward_weight)
                seq_full = jnp.concatenate(
                    [jnp.zeros((gen.shape[0], 1), gen.dtype), gen], axis=1)
                out = self.i2t_model.forward(i2t_p, feats, seq_full,
                                             training=False)
                if isinstance(out, list):
                    out = out[-1]  # stackcap: final head drives decoding
                logps = jnp.take_along_axis(
                    out, gen[..., None].astype(jnp.int32), axis=-1)[..., 0]
                i2t_l = reward_loss(logps, gen, jax.lax.stop_gradient(adv))
                metrics["avg_reward"] = jnp.mean(rs)
            else:
                out = self.i2t_model.forward(i2t_p, feats, batch["labels"],
                                             training=True, rng=rng,
                                             ss_prob=ss_prob,
                                             ss_enabled=ss_enabled,
                                             aux_out=bn_aux)
                i2t_l = language_model_loss(out, batch["labels"][:, 1:],
                                            batch["masks"][:, 1:])
            metrics["i2t_loss"] = i2t_l
            total = total + i2t_l

        if self.nmt_model is not None and cfg.nmt_train_flag:
            nb = batch["nmt"]
            # `word￨feat` streams ride only when the corpus has them (and
            # only the BiLSTM route consumes them — fork Models.py:192)
            fk = ({"src_feats": nb["src_feats"]} if "src_feats" in nb else {})
            outs, _ = self.nmt_model.forward(nmt_p, nb["src"], nb["lengths"],
                                             nb["tgt"], training=True, rng=rng,
                                             **fk)
            logits = self.nmt_model.generator_logits(nmt_p, outs)
            nmt_l, stats = nmt_loss(logits, nb["tgt"][:, 1:],
                                    label_smoothing=cfg.label_smoothing)
            metrics["nmt_loss"] = nmt_l
            metrics["nmt_ppl"] = stats.ppl()
            metrics["nmt_acc"] = stats.accuracy()
            metrics["nmt_words"] = stats.n_words  # -> tokens/s in the CLI
            total = total + nmt_l

            if self.joint_vocab is not None and self.i2t_model is not None:
                # Weight_Trans: zh captioner embed <-> NMT src embed
                # (criterion.py:294-364)
                cap_rows, src_rows = self.joint_vocab
                wemb = weight_trans_loss(i2t_p["embed"],
                                         self.nmt_model.src_embedding(nmt_p),
                                         cap_rows, src_rows)
                metrics["wemb_loss"] = wemb
                total = total + wemb
            if (self.cfg.nmt_kld_train_flag
                    and self.nmt_teacher_params is not None):
                t_outs, _ = self.nmt_model.forward(
                    jax.lax.stop_gradient(self.nmt_teacher_params),
                    nb["src"], nb["lengths"], nb["tgt"], **fk)
                t_logits = self.nmt_model.generator_logits(
                    self.nmt_teacher_params, t_outs)
                t_probs = jax.nn.softmax(
                    jax.lax.stop_gradient(t_logits), axis=-1)
                s_logprobs = jax.nn.log_softmax(logits, axis=-1)
                kld = kld_loss(s_logprobs, t_probs)
                metrics["nmt_kld"] = kld
                total = total + kld

            if self.joint_vocab_y is not None:
                # Weight_Trans_y: NMT tgt embed <-> FROZEN pretrained en
                # (COCO) captioner embedding (criterion.py:366-434 loads the
                # coco checkpoint's table as a constant)
                coco_emb, coco_rows, tgt_rows = self.joint_vocab_y
                wemb_y = weight_trans_loss(
                    self.nmt_model.tgt_embedding(nmt_p),
                    jax.lax.stop_gradient(coco_emb), tgt_rows, coco_rows)
                metrics["wemb_y_loss"] = wemb_y
                total = total + wemb_y

        metrics["total_loss"] = total
        if bn_aux:
            metrics["_bn_aux"] = bn_aux  # popped by the step before return
        return total, metrics

    def _build_step(self, rl: bool, ss_enabled: bool = True):
        cfg = self.cfg
        train_i2t = self.i2t_model is not None and cfg.i2t_train_flag
        train_nmt = self.nmt_model is not None and cfg.nmt_train_flag

        def step(i2t_p, nmt_p, i2t_opt, nmt_opt, batch, lr_i2t, lr_nmt,
                 ss_prob, rng):
            def loss_fn(ps):
                return self._loss_terms(ps[0], ps[1], batch, ss_prob, rng,
                                        rl=rl, ss_enabled=ss_enabled)

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)((i2t_p, nmt_p))
            bn_aux = metrics.pop("_bn_aux", None)
            g_i2t, g_nmt = grads
            if train_i2t:
                up, i2t_opt = self.optim.i2t_tx.update(g_i2t, i2t_opt, i2t_p)
                i2t_p = jax.tree.map(lambda p, u: p - lr_i2t * u, i2t_p, up)
                if bn_aux:
                    from ..models.att import apply_bn_updates
                    i2t_p = apply_bn_updates(i2t_p, bn_aux)
            if train_nmt:
                up, nmt_opt = self.optim.nmt_tx.update(g_nmt, nmt_opt, nmt_p)
                nmt_p = jax.tree.map(lambda p, u: p - lr_nmt * u, nmt_p, up)
            return i2t_p, nmt_p, i2t_opt, nmt_opt, metrics

        return jax.jit(step, donate_argnums=(0, 1, 2, 3))

    # ------------------------------------------------------------------ train
    def train(self, data: Dict[str, Any], *, sc_flag: bool = False
              ) -> Dict[str, float]:
        """One training step on a host batch dict (parity: trainer.py:141-193).
        Returns host-side metric floats."""
        if sc_flag:
            if self._rl_step is None:
                self._rl_step = self._build_step(rl=True)
            step = self._rl_step
        else:
            # ss_enabled is a STATIC trace switch: with the schedule at 0
            # the forward hoists the logit head out of the timestep scan
            # (base.py split-head path) — one retrace when the ramp starts.
            if float(self.optim.ss_prob(self.epoch)) > 0.0:
                if self._xe_step_ss is None:
                    self._xe_step_ss = self._build_step(rl=False,
                                                        ss_enabled=True)
                step = self._xe_step_ss
            else:
                if self._xe_step is None:
                    self._xe_step = self._build_step(rl=False,
                                                     ss_enabled=False)
                step = self._xe_step

        def to_device(k, v):
            # halve H2D bytes for the big float feature tensors by casting
            # to the compute dtype on host before upload
            if (self.cfg.dtype == "bfloat16"
                    and k in ("fc_feats", "att_feats", "attri_feats")
                    and hasattr(v, "dtype") and v.dtype == np.float32):
                import ml_dtypes

                v = v.astype(ml_dtypes.bfloat16)
            return jnp.asarray(v)

        batch = {k: to_device(k, v) for k, v in data.items()
                 if k in ("fc_feats", "att_feats", "attri_feats", "att_masks",
                          "labels", "masks", "gts", "gts_masks")}
        if "nmt" in data:
            batch["nmt"] = {k: jnp.asarray(v) for k, v in data["nmt"].items()}
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)

        self.rng, sub = jax.random.split(self.rng)
        lr_i2t = jnp.float32(self.optim.i2t_lr(self.epoch))
        lr_nmt = jnp.float32(self.optim.nmt_lr(self.epoch_nmt))
        ss_prob = jnp.float32(self.optim.ss_prob(self.epoch))
        (self.i2t_params, self.nmt_params, self.optim.i2t_state,
         self.optim.nmt_state, metrics) = step(
            self.i2t_params, self.nmt_params, self.optim.i2t_state,
            self.optim.nmt_state, batch, lr_i2t, lr_nmt, ss_prob, sub)
        self.optim.nmt_step += 1
        self.iteration += 1
        out = {k: float(v) for k, v in metrics.items()}
        out["lr_i2t"] = float(lr_i2t)
        out["lr_nmt"] = float(lr_nmt)
        out["ss_prob"] = float(ss_prob)
        import math

        if not math.isfinite(out.get("total_loss", 0.0)):
            self.nan_steps += 1
            if self.nan_steps >= self.max_nan_steps:
                raise FloatingPointError(
                    f"non-finite loss for {self.nan_steps} consecutive steps "
                    f"at iter {self.iteration}: {out}")
        else:
            self.nan_steps = 0
        return out

    # ------------------------------------------------------------------ eval
    def eval(self, loader, *, nmt_valid=None, num_images: int = -1,
             beam_size: Optional[int] = None, language_eval_refs=None) -> dict:
        """Validation pass with best-CIDEr / best-NMT-acc tracking
        (parity: trainer.py:195-215). Returns the eval_split dict plus
        {'is_best': bool}."""
        from ..eval.eval_utils import eval_split

        out = eval_split(self.i2t_model, self.i2t_params, loader,
                         split="val", num_images=num_images,
                         beam_size=beam_size or self.cfg.beam_size,
                         language_eval_refs=language_eval_refs,
                         model_id=self.cfg.id, nmt_model=self.nmt_model,
                         nmt_params=self.nmt_params, nmt_valid=nmt_valid)
        score = (out.get("lang_stats") or {}).get("CIDEr", -out["loss"])
        out["is_best"] = self.best_cider is None or score > self.best_cider
        if out["is_best"]:
            self.best_cider = score
        if out.get("nmt_stats"):
            acc = out["nmt_stats"]["valid_acc"]
            if self.best_nmt_acc is None or acc > self.best_nmt_acc:
                self.best_nmt_acc = acc
        return out

    # ------------------------------------------------------------- profiling
    def profile(self, data_iter, n_steps: int = 5, log_dir: str = None,
                sc_flag: bool = False) -> dict:
        """Capture a jax.profiler device trace over n_steps training steps
        (SURVEY.md §5.1: the reference only has wall-clock prints,
        train.py:60-63 — this is the tracing upgrade). Returns host/device
        timing summary; trace viewable in TensorBoard/Perfetto."""
        import time

        import jax.profiler

        log_dir = log_dir or (self.cfg.checkpoint_path + "/trace")
        times = []
        with jax.profiler.trace(log_dir):
            for _ in range(n_steps):
                t0 = time.perf_counter()
                self.train(next(data_iter), sc_flag=sc_flag)
                times.append(time.perf_counter() - t0)
        return {"trace_dir": log_dir, "steps": n_steps,
                "mean_step_s": sum(times) / len(times),
                "min_step_s": min(times)}

    # ----------------------------------------------------------------- ckpt
    def save(self, loader_state: Optional[dict] = None,
             histories: Optional[dict] = None, best: bool = False) -> None:
        infos = {
            "iter": self.iteration, "epoch": self.epoch,
            "epoch_nmt": self.epoch_nmt,
            "best_cider": self.best_cider, "best_nmt_acc": self.best_nmt_acc,
            "opt": self.cfg.to_dict(),
            "loader_state": loader_state,
            # rng stream position: resume reproduces the exact dropout /
            # scheduled-sampling coins and SCST samples (the reference's
            # resume does not — torch RNG state isn't in its checkpoints)
            "rng": np.asarray(self.rng).tolist(),
        }
        self.ckpt.save(i2t_params=self.i2t_params, nmt_params=self.nmt_params,
                       optim_state=self.optim.state_dict(), infos=infos,
                       histories=histories, best=best)
        if self.nmt_model is not None:
            # make the run dir consumable by the STANDALONE translate CLI
            # (reference eval_pivot shells out to OpenNMT translate.py with a
            # self-describing .pt checkpoint, eval_pivot.py:154-161; our
            # msgpack needs this sidecar to rebuild the model)
            import dataclasses as _dc
            import os as _os

            from .checkpoint import save_json

            kind = type(self.nmt_model).__name__
            save_json(_os.path.join(self.ckpt.dir, "nmt_config.json"),
                      {"model_type": ("transformer" if "Transformer" in kind
                                      else "rnn"),
                       **_dc.asdict(self.nmt_model)})

    def load(self, best: bool = False) -> dict:
        """Restore. Mesh-aware: every restored leaf is re-placed with the
        sharding of the CURRENT (template) leaf, so a checkpoint written
        under one mesh restores onto whatever mesh this Trainer's params
        were initialized/placed on — including a different shape or an
        unmeshed single chip (checkpoint.load_pytree resharding path)."""
        infos = self.ckpt.load_infos(best=best)
        from .checkpoint import check_resume_compat, tree_shardings
        check_resume_compat(infos.get("opt", {}), self.cfg)
        if self.i2t_params is not None:
            self.i2t_params = self.ckpt.load_params(
                "model_i2t", self.i2t_params, best=best,
                shardings=tree_shardings(self.i2t_params))
        if self.nmt_params is not None:
            self.nmt_params = self.ckpt.load_params(
                "model_nmt", self.nmt_params, best=best,
                shardings=tree_shardings(self.nmt_params))
        state_tpl = self.optim.state_dict()
        optim_state = self.ckpt.load_params("optimizer", state_tpl, best=best,
                                            shardings=tree_shardings(state_tpl))
        self.optim.load_state_dict(optim_state)
        self.iteration = infos["iter"]
        self.epoch = infos["epoch"]
        self.epoch_nmt = infos["epoch_nmt"]
        self.best_cider = infos.get("best_cider")
        self.best_nmt_acc = infos.get("best_nmt_acc")
        if infos.get("rng") is not None:
            self.rng = jnp.asarray(infos["rng"], jnp.uint32)
        return infos

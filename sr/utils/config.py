"""Configuration: one dataclass, reference-compatible flag names.

The reference configures everything through a single argparse block
(reference: main.py:parse_args — --model_name --num_channels --scale_factor
--crop_size --num_epochs --save_epochs --batch_size --test_batch_size --lr
--num_threads --data_dir --save_dir --train_dataset --test_dataset). The
same names are kept here so reference users can switch without relearning
flags; TPU-specific knobs (dtype, mesh) are additive.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class SRConfig:
    # -- reference-compatible flags (main.py:parse_args) -----------------
    model_name: str = "SRCNN"
    num_channels: int = 1
    scale_factor: int = 4
    # multi-scale training for pre-upsample models (VDSR/DRCN): one net
    # trained on a mix of these factors (empty = single scale_factor)
    scale_factors: tuple = ()
    crop_size: int = 128
    num_epochs: int = 100
    save_epochs: int = 10
    batch_size: int = 32
    test_batch_size: int = 1
    lr: float | None = None  # None → model default
    data_dir: str = "./data"
    save_dir: str = "./results"
    train_dataset: str = "bsds300"
    test_dataset: str = "Set5"
    num_threads: int = 0  # kept for CLI parity; the pipeline is on-device
    # sampler random-scale draw: 'matrix' (default — per-item reference
    # semantics, numerically the item-mode resize, but the scale draw
    # selects a resize MATRIX instead of a data branch so vmap lowers to
    # one matmul pair; measured fastest of the three modes — PERF.md
    # "matrix sampler"), 'item' (the literal reference lowering, one
    # lax.switch per sample), or 'batch' (one draw per batch — a
    # behavioral delta, kept for A/Bs)
    random_scale_mode: str = "matrix"

    # -- model hyperparameters (per-model defaults applied by registry) --
    base_filter: int = 64
    num_resblocks: int = 16
    num_recursions: int = 16  # DRCN
    num_pyramid_convs: int = 5  # LapSRN feature convs per level
    res_scale: float = 1.0  # EDSR residual scaling
    # EDSR lr halving interval in STEPS (paper: every 2e5 minibatch
    # updates). Round-3 and earlier used 50 epochs x steps_per_epoch
    # (=10k steps at the zoo's spe=200), which decayed lr ~2^15 over a
    # 150k-step run and silently froze long trainings (found by the
    # round-4 procedural-benchmark scaling probe).
    lr_halve_steps: int = 200_000
    # VDSR adjustable-clip θ (update global-norm ≤ θ). The reference
    # recipe's 0.4 sits at the edge of stability and caps VDSR ~1.4 dB
    # below what the same run reaches at 0.05 (measured 4-arm +
    # refinement A/B, results_vdsr_ablation*.json; θ=4.0 diverges
    # outright). Default is the measured-better 0.05; set 0.4 for
    # literal reference behavior (PARITY.md delta 11).
    vdsr_clip_theta: float = 0.05

    # -- SRGAN ------------------------------------------------------------
    pretrain_epochs: int = 10
    vgg_loss_weight: float = 6e-3
    adv_loss_weight: float = 1e-3
    vgg_weights_path: str | None = None  # torchvision vgg19 state_dict (.pth)
    vgg_output_layer: str = "relu5_4"  # phi_54 (paper final); phi_22 = relu2_2
    # G's adversarial term: True evaluates D in train mode (batch-stat
    # BN — the reference's module state in that pass); False (default)
    # uses eval-mode D (running stats). A/B at 20k steps on the synthetic
    # zoo: train-mode 20.84 dB vs eval-mode 25.35 dB — batch-stat BN over
    # an all-fake batch normalizes away D's discrimination signal and
    # over-drives the adversarial term. Documented delta (PARITY.md);
    # set True for literal reference behavior.
    adv_d_train_mode: bool = False

    # -- TPU / runtime ------------------------------------------------------
    dtype: str = "bfloat16"  # compute dtype; params stay float32
    steps_per_epoch: int = 200
    seed: int = 42
    mesh_shape: tuple = ()  # e.g. (8,) for 8-way data parallel; () = auto
    mesh_axes: tuple = ("data",)
    log_every: int = 50
    # >1 folds K train steps + on-device batch sampling into ONE jitted
    # program (lax.scan) — amortizes per-dispatch host/relay latency
    steps_per_dispatch: int = 1
    keep_checkpoints: int = 3
    resume: bool = True
    use_pallas: bool = False  # route hot ops through Pallas kernels
    # train tail-shuffle models (ESPCN/EDSR) in PRE-shuffle space: the
    # loss compares the pre-shuffle output against space_to_depth(hr)
    # (exact — elementwise-mean losses are permutation-invariant, and
    # EDSR's out_conv folds exactly through the final shuffle), removing
    # the full-res depth_to_space layout copies from fwd+bwd
    # (~14% of the EDSR step in the round-4 backward attribution).
    # Ignored by models without a trailing shuffle. "full" folds EVERY
    # tail conv through EVERY shuffle (EDSR): all tail convs run at LR
    # resolution with r²-wider channels and no d2s copies anywhere in
    # fwd+bwd; the loss target is the matching space_to_depth chain.
    preshuffle_loss: bool | str = False

    def replace(self, **kw) -> "SRConfig":
        return dataclasses.replace(self, **kw)

    @property
    def effective_lr(self) -> float:
        if self.lr is not None:
            return self.lr
        from sr.models.registry import get_spec

        return get_spec(self.model_name).default_lr

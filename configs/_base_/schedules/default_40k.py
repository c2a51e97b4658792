"""40k-iteration schedule, no warmup: AdamW 1e-4 wd 0.05 + PolyLR power 0.9
(reference dg_lora_dinov2_ms_masked.py:11-45 optim_wrapper/train_cfg)."""

config = dict(
    optimizer=dict(lr=1e-4, weight_decay=0.05, betas=(0.9, 0.999), eps=1e-8,
                   poly_power=0.9, warmup_steps=0),
    schedule=dict(max_iters=40000, val_interval=8000,
                  checkpoint_interval=4000, max_keep_ckpts=3,
                  log_interval=50, seed=0),
)

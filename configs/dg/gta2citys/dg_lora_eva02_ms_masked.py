"""DG GTAV->Cityscapes with LoRA EVA02-L under the MsVFM scheme (reference
configs/dg/gta2citys family + configs/_base_/models/lora_eva02_ms_masked.py)."""

config = dict(
    _base_=["dg_lora_dinov2_ms_masked.py"],
    name="dg_lora_eva02_ms_masked",
    model=dict(
        backbone=dict(
            _delete_=True,
            type="LoRABackbone",
            backbone=dict(
                type="EVA2",
                patch_size=16,
                embed_dim=1024,
                depth=24,
                num_heads=16,
                mlp_ratio=2.6666666666666665,
                img_size=512,
                init_values=None,
                drop_path_rate=0.1,
                rope=True,
                pt_hw_seq_len=16,
                intp_freq=True,
                subln=True,
                naiveswiglu=True,
                use_abs_pos_emb=True,
                out_indices=[7, 11, 15, 23],
            ),
            checkpoint="checkpoints/eva02_converted.npz",
            Lora_config=dict(
                r=32,
                lora_alpha=32,
                target_modules=["q_proj", "k_proj", "v_proj", "attn.proj"],
                lora_dropout=0.1,
            ),
        ),
    ),
)

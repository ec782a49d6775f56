"""Model registry: model_type string -> constructor module path.

The reference kept an unused name->class-name dict (experiments/
registry.py:2-9); here the registry is real: cli._build_model_overrides
validates ``--model`` strings against it (unknown names fail fast with
the valid list instead of surfacing later as a KeyError deep in the
training dispatch).
"""
MODEL_REGISTRY = {
    "fusion_late": "pd_fusion.models.fusion_late:LateFusionModel",
    "fusion_masked": "pd_fusion.models.fusion_masked:MaskedFusionModel",
    "fusion_moddrop": "pd_fusion.models.fusion_moddrop:ModalityDropoutModel",
    "moe": "pd_fusion.models.moe:MoEModel",
    "unimodal_gbdt": "pd_fusion.models.unimodal_gbdt:UnimodalGBDT",
    "unimodal_mlp": "pd_fusion.models.fusion_late:LateFusionModel",
    "mil_attention": "pd_fusion.models.mil_attention:MilAttentionModel",
    "mil_attention_ft": "pd_fusion.models.mil_attention_finetune:MilAttentionFineTuneModel",
    "constant": "pd_fusion.models.dummy:ConstantProbabilityModel",
}

"""Model artifact loading.

Every JAX-family model saves a dict artifact tagged with ``kind``
(fusion_late / fusion_masked / fusion_moddrop / moe / mil_attention /
mil_attention_ft); host-side models (GBDT, constant, calibrated,
conformal) pickle whole objects. ``load_model`` dispatches on whatever it
finds, which is what powers the ``pd-fusion evaluate`` subcommand (the
reference leaves that command unimplemented — cli.py prints "Command not
implemented yet"; here it works).
"""
from pd_fusion.utils.io import load_pickle

_KIND_LOADERS = {
    "fusion_late": ("pd_fusion.models.fusion_late", "LateFusionModel"),
    "fusion_masked": ("pd_fusion.models.fusion_masked", "MaskedFusionModel"),
    "fusion_moddrop": ("pd_fusion.models.fusion_moddrop", "ModalityDropoutModel"),
    "moe": ("pd_fusion.models.moe", "MoEModel"),
    "mil_attention": ("pd_fusion.models.mil_attention", "MilAttentionModel"),
    "mil_attention_ft": ("pd_fusion.models.mil_attention_finetune", "MilAttentionFineTuneModel"),
}


def load_model(path):
    """Load any model artifact produced by this framework."""
    obj = load_pickle(path)
    if isinstance(obj, dict) and "kind" in obj:
        kind = obj["kind"]
        if kind not in _KIND_LOADERS:
            raise ValueError(f"Unknown model artifact kind: {kind}")
        module_name, cls_name = _KIND_LOADERS[kind]
        import importlib

        cls = getattr(importlib.import_module(module_name), cls_name)
        return cls.load(path)
    # whole-object pickles (GBDT, ConstantProbabilityModel, CalibratedModel,
    # MaskConformalWrapper) deserialize directly
    return obj

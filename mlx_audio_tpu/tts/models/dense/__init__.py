"""`dense` Ming-Omni variant: always builds the Qwen2 backbone.

Parity: /root/reference/mlx_audio/tts/models/dense/dense.py — a shim over
bailingmm that forces the non-MoE path and reads llm_config/text_config.
"""

from typing import Any, Dict, Union

from ..bailingmm import Model as BailingMMModel
from ..bailingmm import ModelConfig as BailingMMModelConfig


class ModelConfig(BailingMMModelConfig):
    @classmethod
    def from_dict(cls, config: dict) -> "ModelConfig":
        return cls(
            model_type="dense",
            text_config=config.get("llm_config",
                                   config.get("text_config")),
            audio_tokenizer_config=config.get("audio_tokenizer_config"),
            ditar_config=config.get("ditar_config"),
            aggregator_config=config.get("aggregator_config"),
            model_path=config.get("model_path"),
        )


class Model(BailingMMModel):
    def __init__(self, config: Union[ModelConfig, Dict[str, Any]] = None,
                 **kwargs):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        elif config is None and kwargs:
            config = ModelConfig.from_dict(kwargs)
        super().__init__(config)
        self.model_type = "dense"

    @staticmethod
    def _is_moe_llm_config(_llm_cfg: Dict[str, Any]) -> bool:
        # dense variants always build the Qwen2 backbone path
        return False


__all__ = ["Model", "ModelConfig"]

from .moss_audio_tokenizer import (Model, ModelConfig, MossAudioTokenizer,
                                   StreamingDecoder)

__all__ = ["Model", "ModelConfig", "MossAudioTokenizer",
           "StreamingDecoder"]

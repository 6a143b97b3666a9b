from rassengine_tpu.core.config import EngineConfig, get_config, set_config

__all__ = ["EngineConfig", "get_config", "set_config"]

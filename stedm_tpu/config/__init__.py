from stedm_tpu.config.compose import Config, compose, load_yaml, to_container

__all__ = ["Config", "compose", "load_yaml", "to_container"]

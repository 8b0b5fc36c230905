from spinix_spark.engine.stores import DeviceSnapshot, StateStore, Zone, ZoneStore
from spinix_spark.engine.runtime import eval_spec
from spinix_spark.engine.detect import Engine, Rule

__all__ = [
    "DeviceSnapshot",
    "StateStore",
    "Zone",
    "ZoneStore",
    "eval_spec",
    "Engine",
    "Rule",
]

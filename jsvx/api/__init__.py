from .events import EventDispatcher
from .errors import MediaError
from .config import PlayerConfig
from .decoder import Decoder
from .player import Player, ReadyState, NetworkState

__all__ = [
    "EventDispatcher",
    "MediaError",
    "PlayerConfig",
    "Decoder",
    "Player",
    "ReadyState",
    "NetworkState",
]

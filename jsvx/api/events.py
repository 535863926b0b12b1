"""Event dispatching (re-export; implementation in jsvx.utils.events)."""

from ..utils.events import EventDispatcher

__all__ = ["EventDispatcher"]

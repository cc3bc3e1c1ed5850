"""OpenAI-compatible serving layer with continuous batching.

Reference analog: tools/server (slot state machine server-context.cpp:36,
update_slots :1664, HTTP routes server.cpp:149-187).
"""

from .engine import ServerEngine, Task

__all__ = ["ServerEngine", "Task"]

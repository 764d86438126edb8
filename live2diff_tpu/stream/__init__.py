from .state_machine import init_window_state, update_window_state  # noqa: F401
from .state import StreamState  # noqa: F401

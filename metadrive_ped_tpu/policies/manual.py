"""Host-side manual control (reference: policy/manual_control_policy.py +
engine/core/manual_controller.py).

The reference polls a keyboard / steering wheel / Xbox pad through Panda3D or
pygame and routes the input to the tracked agent. Here a controller is a
small host object whose ``process_input()`` returns an (steering, throttle)
pair or None (fall through to the policy action); the env applies it to row 0
of the action batch. Keyboard input needs pygame + a display — both gated so
headless TPU hosts degrade gracefully; ``ScriptedController`` provides the
same interface for tests and programmatic takeover.
"""
import numpy as np


class BaseController:
    def process_input(self):
        """Return [steering, throttle] in [-1, 1] or None."""
        raise NotImplementedError


class ScriptedController(BaseController):
    """Deterministic controller for tests / scripted takeover: feed it a
    callable or a sequence of actions."""

    def __init__(self, source):
        self._source = source
        self._i = 0

    def process_input(self):
        if callable(self._source):
            return self._source()
        if self._i >= len(self._source):
            return None
        a = self._source[self._i]
        self._i += 1
        return a


class KeyboardController(BaseController):
    """pygame arrow-key control (engine/core/manual_controller.py:99-171:
    incremental steering/throttle with decay). Requires a display."""

    STEERING_INCREMENT = 0.04
    STEERING_DECAY = 0.25
    THROTTLE_INCREMENT = 0.1
    THROTTLE_DECAY = 0.2

    def __init__(self):
        import pygame  # gated: not available headless
        pygame.init()
        pygame.display.set_mode((200, 100))
        self._pygame = pygame
        self.steering = 0.0
        self.throttle = 0.0

    def process_input(self):
        pygame = self._pygame
        pygame.event.pump()
        keys = pygame.key.get_pressed()
        if keys[pygame.K_LEFT]:
            self.steering = min(self.steering + self.STEERING_INCREMENT, 1.0)
        elif keys[pygame.K_RIGHT]:
            self.steering = max(self.steering - self.STEERING_INCREMENT, -1.0)
        else:
            self.steering *= 1 - self.STEERING_DECAY
        if keys[pygame.K_UP]:
            self.throttle = min(self.throttle + self.THROTTLE_INCREMENT, 1.0)
        elif keys[pygame.K_DOWN]:
            self.throttle = max(self.throttle - self.THROTTLE_INCREMENT, -1.0)
        else:
            self.throttle *= 1 - self.THROTTLE_DECAY
        return np.array([self.steering, self.throttle], np.float32)


def make_controller(kind):
    """Controller factory (manual_control_policy.py:30-43). Falls back to a
    no-op scripted controller when the requested device is unavailable."""
    if isinstance(kind, BaseController):
        return kind
    if callable(kind) or isinstance(kind, (list, tuple)):
        return ScriptedController(kind)
    if kind == "keyboard":
        try:
            return KeyboardController()
        except Exception:
            return ScriptedController(lambda: None)
    raise ValueError(f"No such a controller type: {kind}")

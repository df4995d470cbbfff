"""Shared test helpers."""


class FakeGroupState:
    """Minimal GroupState stand-in for driving applyInPandasWithState
    functions directly (exists/get/update/setTimeoutTimestamp)."""

    hasTimedOut = False

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts

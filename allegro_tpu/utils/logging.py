"""Rank-aware logging (role of nequip's ``RankedLogger``,
consumed at reference ``allegro/model/allegro_models.py:25,31``): in
multi-process SPMD runs only process 0 emits, so logs aren't duplicated."""

from __future__ import annotations

import logging


class RankedLogger:
    def __init__(self, name: str = "allegro_tpu", rank_zero_only: bool = True):
        self._logger = logging.getLogger(name)
        self.rank_zero_only = rank_zero_only

    def _should_log(self) -> bool:
        if not self.rank_zero_only:
            return True
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True

    def __getattr__(self, level):
        if level in ("debug", "info", "warning", "error", "critical"):

            def log(msg, *args, **kwargs):
                if self._should_log():
                    getattr(self._logger, level)(msg, *args, **kwargs)

            return log
        raise AttributeError(level)

"""Pydantic row contracts used by validation tests.

Same shape as the reference's declared schemas
(/root/reference/src/data_extractor/schemas/todo.py:12-16 — fields and
constraints re-declared from the survey, not copied code).
"""

from __future__ import annotations

from pydantic import BaseModel, Field


class TodoItem(BaseModel):
    userId: int = Field(ge=1)
    id: int = Field(ge=1)
    title: str = Field(min_length=1)
    completed: bool

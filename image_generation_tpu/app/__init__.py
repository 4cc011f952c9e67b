"""Application surface: CLI, figures, file protocol (UI-agnostic)."""

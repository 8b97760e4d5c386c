"""Dataset-prep tooling (reference layer L7: utils/)."""

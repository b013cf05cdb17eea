"""Physical-plan introspection & audit (the 100 TB posture, testable)."""

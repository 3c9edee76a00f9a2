"""Plan inspection: explain capture and scale-posture audits."""

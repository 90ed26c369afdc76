"""Medical imaging datasets (to be populated in upcoming rounds)."""

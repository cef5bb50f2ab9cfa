"""Pipeline plans: end-to-end extraction job, checkpoint manifest, resume."""

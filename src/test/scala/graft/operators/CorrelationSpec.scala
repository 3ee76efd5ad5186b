package graft.operators

import graft.SparkSpec

/** Rule-driven correlation engine (correlation_engine.go surface). */
class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def res(rows: (String, String, String, String, String)*) =
    rows.toDF("id", "provider", "resource_type", "name", "metadata")

  private def pairs(df: org.apache.spark.sql.DataFrame, rule: String) =
    df.filter(df("rule") === rule)
      .select("source_id", "target_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("same-provider rules: every built-in matcher correlates by key") {
    val inv = res(
      // EC2 + EBS: vol-1 attached to i-1, vol-9 attached elsewhere
      ("i-1", "aws", "aws:ec2:instance", "web-1",
        """{"instance_id":"inst1"}"""),
      ("vol-1", "aws", "aws:ebs:volume", "vol-web",
        """{"attachments":[{"instance_id":"inst1"},{"instance_id":"instX"}]}"""),
      ("vol-9", "aws", "aws:ebs:volume", "vol-other",
        """{"attachments":[{"instance_id":"inst9"}]}"""),
      // LB targets i-1 by resource id
      ("lb-1", "aws", "aws:elbv2:loadbalancer", "front",
        """{"targets":[{"id":"i-1"},{"id":"i-404"}]}"""),
      // VPC/subnet equi-key
      ("vpc-1", "aws", "aws:vpc:vpc", "main", """{"vpc_id":"v1"}"""),
      ("sn-1", "aws", "aws:vpc:subnet", "a", """{"vpc_id":"v1"}"""),
      ("sn-2", "aws", "aws:vpc:subnet", "b", """{"vpc_id":"v2"}"""),
      // K8s service selectors vs pod labels: any entry match
      ("svc-1", "k8s", "k8s:core:service", "api",
        """{"selectors":{"app":"api","tier":"web"}}"""),
      ("pod-1", "k8s", "k8s:core:pod", "api-0",
        """{"labels":{"app":"api","tier":"web"}}"""),
      ("pod-2", "k8s", "k8s:core:pod", "db-0",
        """{"labels":{"app":"db"}}"""),
      // Azure VM/disk
      ("avm-1", "azure", "azure:compute:virtualmachine", "azvm",
        """{"vm_id":"az1"}"""),
      ("adisk-1", "azure", "azure:storage:disk", "azd",
        """{"attached_vm":"az1"}"""),
      // GCP instance/disk: users path trailing segment == instance name
      ("gi-1", "gcp", "gcp:compute:instance", "gvm",
        """{"name":"gvm"}"""),
      ("gd-1", "gcp", "gcp:storage:disk", "gdisk",
        """{"users":["projects/p/zones/z/instances/gvm"]}"""))
    val out = Correlation.correlate(inv, enableCrossProvider = false).cache()
    assert(pairs(out, "EC2-EBS-Attachment") == Set("i-1" -> "vol-1"))
    assert(pairs(out, "LoadBalancer-Target") == Set("lb-1" -> "i-1"))
    assert(pairs(out, "VPC-Subnet-Relationship") == Set("vpc-1" -> "sn-1"))
    // two matching entries still ONE correlation per pair
    assert(pairs(out, "K8s-Pod-Service") == Set("svc-1" -> "pod-1"))
    assert(pairs(out, "Azure-VM-Disk") == Set("avm-1" -> "adisk-1"))
    assert(pairs(out, "GCP-Instance-Disk") == Set("gi-1" -> "gd-1"))
    val row = out.filter(out("rule") === "VPC-Subnet-Relationship").head()
    assert(row.getDouble(4) == 0.98 && !row.getBoolean(5))
  }

  test("cross-provider rules: tiered similarity + config gate") {
    val inv = res(
      // exact name + engine match + large/large → database correlates
      ("rds-1", "aws", "aws:rds:instance", "ordersdb",
        """{"name":"ordersdb","engine":"postgres","instance_class":"db.m5.large"}"""),
      ("sql-1", "azure", "azure:sql:database", "ordersdb",
        """{"name":"ordersdb","engine":"Postgres","sku":"GP_large"}"""),
      // name matches but engines differ and no size words → config 0.5 < 0.6
      ("rds-2", "aws", "aws:rds:instance", "invdb",
        """{"name":"invdb","engine":"mysql","instance_class":"db.m5.xl"}"""),
      ("sql-2", "azure", "azure:sql:database", "invdb",
        """{"name":"invdb","engine":"sqlserver","sku":"HS_x"}"""),
      // storage: containment is 0.8, NOT > 0.8 — only the exact pair hits
      ("s3-1", "aws", "aws:s3:bucket", "logs-bucket",
        """{"name":"logs-bucket"}"""),
      ("gcs-1", "gcp", "gcp:storage:bucket", "logs-bucket",
        """{"name":"logs-bucket"}"""),
      ("s3-2", "aws", "aws:s3:bucket", "data",
        """{"name":"data"}"""),
      ("gcs-2", "gcp", "gcp:storage:bucket", "data-east",
        """{"name":"data-east"}"""),
      // hybrid LB: dns containment 0.8 > 0.6 matches; missing dns never does
      ("lb-a", "aws", "aws:elbv2:loadbalancer", "front",
        """{"dns_name":"app.example.com"}"""),
      ("lb-z", "azure", "azure:network:loadbalancer", "front-az",
        """{"dns_name":"eu.app.example.com"}"""),
      ("lb-n", "azure", "azure:network:loadbalancer", "nodns", """{}"""))
    val out = Correlation.correlate(inv).cache()
    assert(pairs(out, "Multi-Cloud-Database") == Set("rds-1" -> "sql-1"))
    assert(pairs(out, "Cross-Cloud-Storage") == Set("s3-1" -> "gcs-1"))
    assert(pairs(out, "Hybrid-Load-Balancing") == Set("lb-a" -> "lb-z"))
    assert(out.filter(out("rule") === "Multi-Cloud-Database")
      .head().getBoolean(5))
    // the config gate mirrors EnableCrossProviderCorre
    assert(Correlation.correlate(inv, enableCrossProvider = false)
      .filter($"cross_provider").count() == 0)
  }

  test("name similarity tiers: exact, containment, 3-prefix, none") {
    import org.apache.spark.sql.functions.col
    val sims = Seq(
      ("alpha", "Alpha"), ("prod-db", "db"), ("alphaone", "alphatwo"),
      ("abc", "abd"), ("xy", "xy2"))
      .toDF("a", "b")
      .select(Correlation.nameSimilarity(col("a"), col("b")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    // 3-char names fail the >3 prefix guard; "xy" containment in "xy2"
    assert(sims == Seq(1.0, 0.8, 0.6, 0.0, 0.8))
  }
}

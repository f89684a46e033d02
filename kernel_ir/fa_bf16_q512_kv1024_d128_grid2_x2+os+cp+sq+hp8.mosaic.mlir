module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<4096x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<4096x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<4096x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 1, 4, 2>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 8, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 8, 1024, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 8, 1024, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 8, 512, 128>}]} {
    %cst = arith.constant dense<0.127517432> : vector<512x128xf32>
    %c3584 = arith.constant 3584 : index
    %c7 = arith.constant 7 : index
    %c3072 = arith.constant 3072 : index
    %c6 = arith.constant 6 : index
    %c2560 = arith.constant 2560 : index
    %c5 = arith.constant 5 : index
    %c2048 = arith.constant 2048 : index
    %c4 = arith.constant 4 : index
    %c1536 = arith.constant 1536 : index
    %c3 = arith.constant 3 : index
    %c1024 = arith.constant 1024 : index
    %c2 = arith.constant 2 : index
    %c512 = arith.constant 512 : index
    %c1 = arith.constant 1 : index
    %cst_0 = arith.constant dense<0.000000e+00> : vector<512x128xf32>
    %cst_1 = arith.constant dense<0.000000e+00> : vector<512xf32>
    %cst_2 = arith.constant dense<0xFF800000> : vector<512xf32>
    %cst_3 = arith.constant dense<0.000000e+00> : vector<512x1024xf32>
    %c0 = arith.constant 0 : index
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c1_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %4 = arith.extf %3 : vector<512x128xbf16> to vector<512x128xf32>
    %5 = arith.mulf %4, %cst : vector<512x128xf32>
    %6 = arith.truncf %5 : vector<512x128xf32> to vector<512x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %11 = tpu.matmul %6, %8, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %11, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %11, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %12 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %12 {
      %90 = vector.load %arg9[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %11, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %11, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %10, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %13 = vector.load %arg4[%c0, %c1, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %14 = vector.shape_cast %13 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %15 = arith.extf %14 : vector<512x128xbf16> to vector<512x128xf32>
    %16 = arith.mulf %15, %cst : vector<512x128xf32>
    %17 = arith.truncf %16 : vector<512x128xf32> to vector<512x128xbf16>
    %18 = vector.load %arg5[%c0, %c1, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %19 = vector.shape_cast %18 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %20 = vector.load %arg6[%c0, %c1, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %21 = vector.shape_cast %20 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %22 = tpu.matmul %17, %19, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %22, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %22, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %21, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %23 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %23 {
      %90 = vector.load %arg9[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %22, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %22, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %21, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c512, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c512, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c512, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %24 = vector.load %arg4[%c0, %c2, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %25 = vector.shape_cast %24 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %26 = arith.extf %25 : vector<512x128xbf16> to vector<512x128xf32>
    %27 = arith.mulf %26, %cst : vector<512x128xf32>
    %28 = arith.truncf %27 : vector<512x128xf32> to vector<512x128xbf16>
    %29 = vector.load %arg5[%c0, %c2, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %30 = vector.shape_cast %29 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %31 = vector.load %arg6[%c0, %c2, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %32 = vector.shape_cast %31 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %33 = tpu.matmul %28, %30, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %33, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %33, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %32, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c1024, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1024, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1024, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %34 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %34 {
      %90 = vector.load %arg9[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %33, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %33, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %32, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c1024, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1024, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1024, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %35 = vector.load %arg4[%c0, %c3, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %36 = vector.shape_cast %35 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %37 = arith.extf %36 : vector<512x128xbf16> to vector<512x128xf32>
    %38 = arith.mulf %37, %cst : vector<512x128xf32>
    %39 = arith.truncf %38 : vector<512x128xf32> to vector<512x128xbf16>
    %40 = vector.load %arg5[%c0, %c3, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %41 = vector.shape_cast %40 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %42 = vector.load %arg6[%c0, %c3, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %43 = vector.shape_cast %42 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %44 = tpu.matmul %39, %41, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %44, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %44, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %43, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c1536, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1536, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1536, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %45 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %45 {
      %90 = vector.load %arg9[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %44, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %44, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %43, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c1536, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c1536, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c1536, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %46 = vector.load %arg4[%c0, %c4, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %47 = vector.shape_cast %46 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %48 = arith.extf %47 : vector<512x128xbf16> to vector<512x128xf32>
    %49 = arith.mulf %48, %cst : vector<512x128xf32>
    %50 = arith.truncf %49 : vector<512x128xf32> to vector<512x128xbf16>
    %51 = vector.load %arg5[%c0, %c4, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %52 = vector.shape_cast %51 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %53 = vector.load %arg6[%c0, %c4, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %54 = vector.shape_cast %53 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %55 = tpu.matmul %50, %52, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %55, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %55, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %54, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c2048, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2048, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2048, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %56 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %56 {
      %90 = vector.load %arg9[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %55, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %55, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %54, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c2048, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2048, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2048, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %57 = vector.load %arg4[%c0, %c5, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %58 = vector.shape_cast %57 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %59 = arith.extf %58 : vector<512x128xbf16> to vector<512x128xf32>
    %60 = arith.mulf %59, %cst : vector<512x128xf32>
    %61 = arith.truncf %60 : vector<512x128xf32> to vector<512x128xbf16>
    %62 = vector.load %arg5[%c0, %c5, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %63 = vector.shape_cast %62 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %64 = vector.load %arg6[%c0, %c5, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %65 = vector.shape_cast %64 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %66 = tpu.matmul %61, %63, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %66, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %66, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %65, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c2560, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2560, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2560, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %67 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %67 {
      %90 = vector.load %arg9[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %66, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %66, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %65, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c2560, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c2560, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c2560, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %68 = vector.load %arg4[%c0, %c6, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %69 = vector.shape_cast %68 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %70 = arith.extf %69 : vector<512x128xbf16> to vector<512x128xf32>
    %71 = arith.mulf %70, %cst : vector<512x128xf32>
    %72 = arith.truncf %71 : vector<512x128xf32> to vector<512x128xbf16>
    %73 = vector.load %arg5[%c0, %c6, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %74 = vector.shape_cast %73 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %75 = vector.load %arg6[%c0, %c6, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %76 = vector.shape_cast %75 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %77 = tpu.matmul %72, %74, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %77, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %77, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %76, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c3072, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3072, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3072, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %78 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %78 {
      %90 = vector.load %arg9[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %77, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %77, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %76, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c3072, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3072, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3072, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %79 = vector.load %arg4[%c0, %c7, %c0, %c0] : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %80 = vector.shape_cast %79 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %81 = arith.extf %80 : vector<512x128xbf16> to vector<512x128xf32>
    %82 = arith.mulf %81, %cst : vector<512x128xf32>
    %83 = arith.truncf %82 : vector<512x128xf32> to vector<512x128xbf16>
    %84 = vector.load %arg5[%c0, %c7, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %85 = vector.shape_cast %84 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %86 = vector.load %arg6[%c0, %c7, %c0, %c0] : memref<1x8x1024x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x1024x128xbf16>
    %87 = vector.shape_cast %86 : vector<1x1x1024x128xbf16> to vector<1024x128xbf16>
    %88 = tpu.matmul %83, %85, %cst_3 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<512x128xbf16>, vector<1024x128xbf16>, vector<512x1024xf32> -> vector<512x1024xf32>
    scf.if %0 {
      %90 = vector.multi_reduction <maximumf>, %88, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %91 = vector.shape_cast %90 : vector<512xf32> to vector<512x1xf32>
      %92 = vector.broadcast %91 : vector<512x1xf32> to vector<512x128xf32>
      %93 = vector.broadcast %91 : vector<512x1xf32> to vector<512x1024xf32>
      %94 = arith.subf %88, %93 : vector<512x1024xf32>
      %95 = math.exp2 %94 : vector<512x1024xf32>
      %96 = arith.truncf %95 : vector<512x1024xf32> to vector<512x1024xbf16>
      %97 = vector.multi_reduction <add>, %95, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %98 = vector.shape_cast %97 : vector<512xf32> to vector<512x1xf32>
      %99 = vector.broadcast %98 : vector<512x1xf32> to vector<512x128xf32>
      %100 = tpu.matmul %96, %87, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      tpu.vector_store %arg9[%c3584, %c0], %92 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3584, %c0], %99 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3584, %c0], %100 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    %89 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %89 {
      %90 = vector.load %arg9[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %91 = vector.load %arg10[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.load %arg8[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %93 = vector.multi_reduction <maximumf>, %88, %cst_2 [1] : vector<512x1024xf32> to vector<512xf32>
      %94 = vector.shape_cast %93 : vector<512xf32> to vector<512x1xf32>
      %95 = vector.broadcast %94 : vector<512x1xf32> to vector<512x128xf32>
      %96 = arith.maximumf %90, %95 : vector<512x128xf32>
      %97 = vector.extract_strided_slice %96 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %98 = vector.broadcast %97 : vector<512x1xf32> to vector<512x1024xf32>
      %99 = arith.subf %88, %98 : vector<512x1024xf32>
      %100 = math.exp2 %99 : vector<512x1024xf32>
      %101 = arith.subf %90, %96 : vector<512x128xf32>
      %102 = math.exp2 %101 : vector<512x128xf32>
      %103 = arith.truncf %100 : vector<512x1024xf32> to vector<512x1024xbf16>
      %104 = arith.mulf %91, %102 : vector<512x128xf32>
      %105 = vector.multi_reduction <add>, %100, %cst_1 [1] : vector<512x1024xf32> to vector<512xf32>
      %106 = vector.shape_cast %105 : vector<512xf32> to vector<512x1xf32>
      %107 = vector.broadcast %106 : vector<512x1xf32> to vector<512x128xf32>
      %108 = arith.addf %104, %107 : vector<512x128xf32>
      %109 = tpu.matmul %103, %87, %cst_0 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<512x1024xbf16>, vector<1024x128xbf16>, vector<512x128xf32> -> vector<512x128xf32>
      %110 = vector.extract_strided_slice %102 {offsets = [0, 0], sizes = [512, 1], strides = [1, 1]} : vector<512x128xf32> to vector<512x1xf32>
      %111 = vector.broadcast %110 : vector<512x1xf32> to vector<512x128xf32>
      %112 = arith.mulf %92, %111 : vector<512x128xf32>
      %113 = arith.addf %112, %109 : vector<512x128xf32>
      tpu.vector_store %arg9[%c3584, %c0], %96 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg10[%c3584, %c0], %108 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
      tpu.vector_store %arg8[%c3584, %c0], %113 {strides = array<i32>} : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>, 
    }
    scf.if %1 {
      %90 = vector.load %arg10[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %91 = vector.load %arg8[%c0, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %92 = vector.broadcast %90 : vector<512x1xf32> to vector<512x128xf32>
      %93 = arith.divf %91, %92 : vector<512x128xf32>
      %94 = arith.truncf %93 : vector<512x128xf32> to vector<512x128xbf16>
      %95 = vector.shape_cast %94 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %95 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %96 = vector.load %arg10[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %97 = vector.load %arg8[%c512, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %98 = vector.broadcast %96 : vector<512x1xf32> to vector<512x128xf32>
      %99 = arith.divf %97, %98 : vector<512x128xf32>
      %100 = arith.truncf %99 : vector<512x128xf32> to vector<512x128xbf16>
      %101 = vector.shape_cast %100 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c1, %c0, %c0], %101 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %102 = vector.load %arg10[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %103 = vector.load %arg8[%c1024, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %104 = vector.broadcast %102 : vector<512x1xf32> to vector<512x128xf32>
      %105 = arith.divf %103, %104 : vector<512x128xf32>
      %106 = arith.truncf %105 : vector<512x128xf32> to vector<512x128xbf16>
      %107 = vector.shape_cast %106 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c2, %c0, %c0], %107 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %108 = vector.load %arg10[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %109 = vector.load %arg8[%c1536, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %110 = vector.broadcast %108 : vector<512x1xf32> to vector<512x128xf32>
      %111 = arith.divf %109, %110 : vector<512x128xf32>
      %112 = arith.truncf %111 : vector<512x128xf32> to vector<512x128xbf16>
      %113 = vector.shape_cast %112 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c3, %c0, %c0], %113 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %114 = vector.load %arg10[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %115 = vector.load %arg8[%c2048, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %116 = vector.broadcast %114 : vector<512x1xf32> to vector<512x128xf32>
      %117 = arith.divf %115, %116 : vector<512x128xf32>
      %118 = arith.truncf %117 : vector<512x128xf32> to vector<512x128xbf16>
      %119 = vector.shape_cast %118 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c4, %c0, %c0], %119 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %120 = vector.load %arg10[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %121 = vector.load %arg8[%c2560, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %122 = vector.broadcast %120 : vector<512x1xf32> to vector<512x128xf32>
      %123 = arith.divf %121, %122 : vector<512x128xf32>
      %124 = arith.truncf %123 : vector<512x128xf32> to vector<512x128xbf16>
      %125 = vector.shape_cast %124 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c5, %c0, %c0], %125 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %126 = vector.load %arg10[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %127 = vector.load %arg8[%c3072, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %128 = vector.broadcast %126 : vector<512x1xf32> to vector<512x128xf32>
      %129 = arith.divf %127, %128 : vector<512x128xf32>
      %130 = arith.truncf %129 : vector<512x128xf32> to vector<512x128xbf16>
      %131 = vector.shape_cast %130 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c6, %c0, %c0], %131 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
      %132 = vector.load %arg10[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %133 = vector.load %arg8[%c3584, %c0] : memref<4096x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %134 = vector.broadcast %132 : vector<512x1xf32> to vector<512x128xf32>
      %135 = arith.divf %133, %134 : vector<512x128xf32>
      %136 = arith.truncf %135 : vector<512x128xf32> to vector<512x128xbf16>
      %137 = vector.shape_cast %136 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c7, %c0, %c0], %137 {strides = array<i32>} : memref<1x8x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c8_i32 = arith.constant 8 : i32
    %0 = arith.muli %arg1, %c8_i32 : i32
    %1 = arith.divsi %0, %c8_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c8_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c1_i32 = arith.constant 1 : i32
    %c0_i32 = arith.constant 0 : i32
    %c8_i32 = arith.constant 8 : i32
    %0 = arith.muli %arg1, %c8_i32 : i32
    %1 = arith.divsi %0, %c8_i32 : i32
    %2 = arith.cmpi sgt, %0, %c0_i32 : i32
    %3 = arith.extui %2 : i1 to i32
    %4 = arith.cmpi slt, %0, %c0_i32 : i32
    %5 = arith.extui %4 : i1 to i32
    %6 = arith.subi %3, %5 : i32
    %7 = arith.cmpi ne, %6, %c1_i32 : i32
    %8 = arith.remsi %0, %c8_i32 : i32
    %9 = arith.cmpi ne, %8, %c0_i32 : i32
    %10 = arith.andi %7, %9 : i1
    %11 = arith.subi %1, %c1_i32 : i32
    %12 = arith.select %10, %11, %1 : i32
    return %arg0, %12, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

